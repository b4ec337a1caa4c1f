"""Fixture corpus ported from the reference's inline unit tests
(/root/reference/src/extraction.rs:775-1249, src/meili.rs:669-727) —
fictional dictionary data used as executable specs of the extraction
semantics (ordering, dedup, visibility filters, template interpolation).

Dicts here follow worker_spark.schemas.ARTICLE_DATA; missing keys = NULL.
"""

from __future__ import annotations

# src/extraction.rs:829-877 — dual-paradigm noun, insertion-order dedup
NOUN_DUAL_PARADIGM = {
    "lemmas": [
        {
            "lemma": "fjordsting",
            "split_inf": False,
            "paradigm_info": [
                {
                    "tags": ["NOUN", "Masc"],
                    "inflection": [
                        {"word_form": "fjordsting", "tags": ["Sing", "Ind"]},
                        {"word_form": "fjordstingen", "tags": ["Sing", "Def"]},
                        {"word_form": "fjordstinger", "tags": ["Plur", "Ind"]},
                        {"word_form": "fjordstingene", "tags": ["Plur", "Def"]},
                    ],
                },
                {
                    "tags": ["NOUN", "Fem"],
                    "inflection": [
                        {"word_form": "fjordsting", "tags": ["Sing", "Ind"]},
                        {"word_form": "fjordstinga", "tags": ["Sing", "Def"]},
                        {"word_form": "fjordstinger", "tags": ["Plur", "Ind"]},
                        {"word_form": "fjordstingene", "tags": ["Plur", "Def"]},
                    ],
                },
            ],
        }
    ],
    "suggest": ["fjordsting"],
}

# src/extraction.rs:879-906
ABBREVIATIONS = {
    "lemmas": [
        {
            "lemma": "F",
            "paradigm_info": [
                {"tags": ["ABBR"], "inflection": [{"word_form": "F", "tags": []}]}
            ],
        },
        {
            "lemma": "f",
            "paradigm_info": [
                {"tags": ["ABBR"], "inflection": [{"word_form": "f", "tags": []}]}
            ],
        },
    ],
    "suggest": ["F", "f"],
}

# src/extraction.rs:908-935
VERB_SPLIT_INF = {
    "lemmas": [
        {
            "lemma": "velja",
            "split_inf": True,
            "paradigm_info": [
                {
                    "tags": ["VERB"],
                    "inflection": [
                        {"word_form": "vel", "tags": ["Pres"]},
                        {"word_form": "valde", "tags": ["Past"]},
                    ],
                }
            ],
        }
    ],
    "suggest": ["velja"],
}

# src/extraction.rs:949-967
ETYMOLOGY_TEMPLATE = {
    "body": {
        "etymology": [
            {
                "content": "av norrønt $ $",
                "items": [
                    {"type_": "usage", "text": "fjǫrðr"},
                    {"type_": "usage", "text": "þing"},
                ],
            }
        ]
    }
}

# language item resolved through concepts + unknown id fallback + '/>' strip
ETYMOLOGY_CONCEPTS = {
    "body": {
        "etymology": [
            {
                "content": "/>frå $, jf $",
                "items": [
                    {"type_": "language", "id": "norr."},
                    {"type_": "language", "id": "uknown.id"},
                ],
            }
        ]
    }
}

# src/extraction.rs:969-997 — show-filter
DIALECT_SHOW_FILTER = {
    "body": {
        "dialect": [
            {
                "subcats": [
                    {
                        "forms": [
                            {
                                "form": "trållskåg",
                                "sources": [
                                    {"show": 1, "place_name": "Nordfjell", "place_id": 11},
                                    {"show": 0, "place_name": "Sørdal", "place_id": 12},
                                    {"show": 1, "place_name": "Vestmark", "place_id": 13},
                                ],
                            }
                        ]
                    }
                ]
            }
        ]
    }
}

# src/extraction.rs:1009-1032
RELATED_IN_DEFINITIONS = {
    "body": {
        "definitions": [
            {
                "type_": "definition",
                "id": 2,
                "elements": [
                    {
                        "type_": "explanation",
                        "content": "eit slag $",
                        "items": [{"type_": "article_ref", "article_id": 2002}],
                    }
                ],
            }
        ]
    }
}

# src/extraction.rs:1035-1052
RELATED_SUB_ARTICLE = {
    "body": {
        "definitions": [
            {
                "type_": "definition",
                "id": 3,
                "elements": [{"type_": "sub_article", "article_id": 5001, "lemmas": []}],
            }
        ]
    }
}

# src/meili.rs + bibliography categorization test :1180-1248
BIBLIOGRAPHY_ARTICLE = {
    "body": {
        "older_source": [{"bibl_id": 100}, {"bibl_id": 200}],
        "written_form": [
            {"forms": [{"sources": [{"bibl_id": 2027}, {"bibl_id": 10482}]}]}
        ],
        "definitions": [],
    }
}

BIB_ROWS = [
    (100, "FiktA", "Author A", "Title A", "2000"),
    (200, "FiktB", "Author B", "Title B", "2001"),
    (2027, "E.DiktAS", "Dikt Author", "Dikt Title", "1990"),
    (10482, "SagaOH", "Saga Author", "Saga Title", "1850"),
]

# deep article exercising recursion depth 3, attestation vis-filter, union
# place dedup, quote items, polymorphic dialect form
DEEP_ARTICLE = {
    "lemmas": [{"lemma": "djupord", "split_inf": False, "paradigm_info": []}],
    "suggest": ["djupord"],
    "body": {
        "etymology": [
            {
                "content": "frå $",
                "items": [{"type_": "language", "id": "norr."}],
            }
        ],
        "pronunciation": [{"content": "ˈjʉːpuːr"}, {"content": ""}],
        "dialect": [
            {
                "subcats": [
                    {
                        "forms": [
                            {
                                "form": None,
                                "form_content": "jupor",
                                "sources": [
                                    {"show": 1, "place_name": "Nordfjell", "place_id": 11},
                                    {"show": 0, "place_name": "Sørdal", "place_id": 12},
                                ],
                            }
                        ]
                    }
                ]
            }
        ],
        "written_form": [
            {"forms": [{"written_form": "diupord", "sources": [{"bibl_id": 100}]}]}
        ],
        "older_source": [{"bibl_id": 200}],
        "definitions": [
            {
                "type_": "definition",
                "id": 1,
                "elements": [
                    {"type_": "explanation", "content": "eit djupt ord"},
                    {
                        "type_": "example",
                        "quote": {
                            "content": "han sa eit djupord(Fj.Skr III,42)",
                            "items": [],
                        },
                        "place_refs": [
                            {"bibl_id": 300, "vis": 1, "place": {"place_id": 11}},
                            {"bibl_id": 301, "vis": 0, "place": {"place_id": 14}},
                        ],
                    },
                ],
                "sub_definitions": [
                    {
                        "type_": "definition",
                        "id": 2,
                        "elements": [
                            {"type_": "explanation", "content": "i overført tyding"},
                            {
                                "type_": "sub_article",
                                "article_id": 5001,
                                "lemmas": ["grunnord"],
                            },
                        ],
                        "sub_definitions": [
                            {
                                "type_": "definition",
                                "id": 3,
                                "elements": [
                                    {
                                        "type_": "example",
                                        "quote": {
                                            "content": "djupast i fjorden(HaBrev)",
                                            "items": [
                                                {
                                                    "type_": "article_ref",
                                                    "article_id": 2002,
                                                }
                                            ],
                                        },
                                        "place_refs": [
                                            {
                                                "bibl_id": 300,
                                                "vis": 1,
                                                "place": {"place_id": 13},
                                            }
                                        ],
                                    }
                                ],
                            }
                        ],
                    }
                ],
            }
        ],
    },
}

CONCEPTS = {"norr.": "norrønt"}

# Inline-ref quote corpus with expected (code, spec) parses
# (src/extraction.rs:1086-1151). Offsets are asserted separately where the
# reference pins them (test_extract_refs_simple: start=24, end=len).
QUOTE_CASES = [
    ("dei dreiv med fjordfiske(Fj.Skr III,42)", [("Fj.Skr", "III,42")]),
    ("ho sette seg ned og kvilde(HaBrev)", [("HaBrev", None)]),
    ("han tok ljaaen sin(Fj.Skr II,87)og gjekk ut", [("Fj.Skr", "II,87")]),
    ("dei slo graset tidleg(ordt, Vik; DalOrdt 15)", [("DalOrdt", "15")]),
    (
        "garden (den gamle) var stor, og dei (folket) trivdest godt der(Heim.S 1901)",
        [("Heim.S", "1901")],
    ),
    ("det var stilt i fjorden den kvelden", []),
    ("dei budde langt inne i dalen(ordt, Vik)", []),
]
