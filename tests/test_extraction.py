"""Golden extraction tests — direct ports of the reference's unit tests
(/root/reference/src/extraction.rs:775-1249). Each fixture is run through
the DataFrame extraction layer and asserted against the reference's
expected vectors, including insertion-order dedup semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from worker_spark import fixtures as FX
from worker_spark import extraction as X
from worker_spark.functions.inline_refs import extract_refs_from_quote
from worker_spark.functions.json_walk import collect_bibl_ids, find_related_article_ids
from worker_spark.schemas import ARTICLE_DATA


def _extract(spark, data_dict, cols: dict):
    df = spark.createDataFrame([(data_dict,)], schema=f"data: {ARTICLE_DATA.simpleString()}")
    # concepts map column
    concepts = F.create_map(
        *[F.lit(x) for kv in FX.CONCEPTS.items() for x in kv]
    )
    row = df.select(
        *[v(F.col("data"), concepts).alias(k) if _needs_concepts(v) else v(F.col("data")).alias(k) for k, v in cols.items()]
    ).collect()[0]
    return row.asDict()


def _needs_concepts(fn) -> bool:
    import inspect

    return len(inspect.signature(fn).parameters) == 2


LEMMA_COLS = {
    "lemmas": X.lemmas_col,
    "suggest": X.suggest_col,
    "inflections": X.inflections_col,
    "paradigm_tags": X.paradigm_tags_col,
    "inflection_tags": X.inflection_tags_col,
    "has_split_inf": X.has_split_inf_col,
}


def test_lemma_noun_dual_paradigm(spark):
    r = _extract(spark, FX.NOUN_DUAL_PARADIGM, LEMMA_COLS)
    assert r["lemmas"] == ["fjordsting"]
    assert r["suggest"] == ["fjordsting"]
    assert r["inflections"] == [
        "fjordsting",
        "fjordstingen",
        "fjordstinger",
        "fjordstingene",
        "fjordstinga",
    ]
    assert r["paradigm_tags"] == ["NOUN", "Masc", "Fem"]
    assert r["inflection_tags"] == ["Sing", "Ind", "Def", "Plur"]
    assert r["has_split_inf"] is False


def test_lemma_abbreviation(spark):
    r = _extract(spark, FX.ABBREVIATIONS, LEMMA_COLS)
    assert r["lemmas"] == ["F", "f"]
    assert r["inflections"] == ["F", "f"]
    assert r["paradigm_tags"] == ["ABBR"]
    assert r["inflection_tags"] == []
    assert r["has_split_inf"] is False


def test_lemma_verb_split_inf(spark):
    r = _extract(spark, FX.VERB_SPLIT_INF, LEMMA_COLS)
    assert r["has_split_inf"] is True
    assert r["lemmas"] == ["velja"]
    assert r["inflections"] == ["vel", "valde"]
    assert r["paradigm_tags"] == ["VERB"]
    assert r["inflection_tags"] == ["Pres", "Past"]


def test_lemma_empty(spark):
    r = _extract(spark, {}, LEMMA_COLS)
    assert r["lemmas"] == []
    assert r["suggest"] == []
    assert r["inflections"] == []
    assert r["paradigm_tags"] == []
    assert r["inflection_tags"] == []
    assert r["has_split_inf"] is False


def test_first_lemma(spark):
    r = _extract(
        spark,
        {"lemmas": [{"lemma": "strandskog"}, {"lemma": "strandskogen"}]},
        {"first": X.first_lemma_col},
    )
    assert r["first"] == "strandskog"
    assert _extract(spark, {}, {"first": X.first_lemma_col})["first"] == ""
    assert _extract(spark, {"lemmas": []}, {"first": X.first_lemma_col})["first"] == ""


def test_etymology_template(spark):
    r = _extract(spark, FX.ETYMOLOGY_TEMPLATE, {"etymology_parts": X.etymology_parts_col})
    assert r["etymology_parts"] == ["av norrønt fjǫrðr þing"]


def test_etymology_concepts_and_prefix_strip(spark):
    r = _extract(
        spark,
        FX.ETYMOLOGY_CONCEPTS,
        {
            "etymology_parts": X.etymology_parts_col,
            "etymology_languages": X.etymology_languages_col,
        },
    )
    # '/>' stripped; 'norr.' expands via concepts; unknown id falls back to id
    assert r["etymology_parts"] == ["frå norrønt, jf uknown.id"]
    assert r["etymology_languages"] == ["norr.", "uknown.id"]


def test_dialect_show_filter(spark):
    r = _extract(
        spark,
        FX.DIALECT_SHOW_FILTER,
        {
            "dialect_form_parts": X.dialect_form_parts_col,
            "dialect_places": X.dialect_places_col,
            "dialect_place_ids": X.dialect_place_ids_col,
        },
    )
    assert r["dialect_form_parts"] == ["trållskåg"]
    assert r["dialect_places"] == ["Nordfjell", "Vestmark"]
    # place_id extraction does NOT consult show (src/extraction.rs:512-520)
    assert sorted(r["dialect_place_ids"]) == [11, 12, 13]


def test_body_empty(spark):
    r = _extract(
        spark,
        {},
        {
            "etymology_parts": X.etymology_parts_col,
            "dialect_form_parts": X.dialect_form_parts_col,
            "definition_parts": X.definition_parts_col,
        },
    )
    assert r["etymology_parts"] == []
    assert r["dialect_form_parts"] == []
    assert r["definition_parts"] == []


def test_related_ids(spark):
    cols = {"related": X.related_article_ids_col}
    assert _extract(spark, FX.RELATED_IN_DEFINITIONS, cols)["related"] == [2002]
    assert _extract(spark, FX.RELATED_SUB_ARTICLE, cols)["related"] == [5001]
    none_case = {
        "body": {
            "definitions": [
                {
                    "type_": "definition",
                    "id": 1,
                    "elements": [{"type_": "explanation", "content": "noko", "items": []}],
                }
            ]
        }
    }
    assert _extract(spark, none_case, cols)["related"] == []


def test_deep_article_traversal(spark):
    r = _extract(
        spark,
        FX.DEEP_ARTICLE,
        {
            "definition_parts": X.definition_parts_col,
            "example_parts": X.example_parts_col,
            "sub_article_lemmas": X.sub_article_lemmas_col,
            "related": X.related_article_ids_col,
            "attestation_bibl_ids": X.attestation_bibl_ids_col,
            "attestation_place_ids": X.attestation_place_ids_col,
            "all_bibl_ids": X.all_bibl_ids_col,
            "older": X.older_source_bibl_ids_col,
            "written": X.written_form_bibl_ids_col,
            "dialect_form_parts": X.dialect_form_parts_col,
            "pronunciation_parts": X.pronunciation_parts_col,
        },
    )
    # document order through 3 levels of sub_definitions
    assert r["definition_parts"] == ["eit djupt ord", "i overført tyding"]
    assert r["example_parts"] == [
        "han sa eit djupord(Fj.Skr III,42)",
        "djupast i fjorden(HaBrev)",
    ]
    assert r["sub_article_lemmas"] == ["grunnord"]
    # sub_article element id first (depth 2), then quote item at depth 3
    assert r["related"] == [5001, 2002]
    # vis==1 only, dedup across depths
    assert r["attestation_bibl_ids"] == [300]
    assert sorted(r["attestation_place_ids"]) == [11, 13, 14]
    # all-depth bibl scan: older 200, written 100, place_refs 300+301
    assert r["all_bibl_ids"] == [100, 200, 300, 301]
    assert r["older"] == [200]
    assert r["written"] == [100]
    # polymorphic form: bare string null, object content used
    assert r["dialect_form_parts"] == ["jupor"]
    # empty pronunciation dropped
    assert r["pronunciation_parts"] == ["ˈjʉːpuːr"]


@pytest.mark.parametrize("quote,expected", FX.QUOTE_CASES)
def test_inline_ref_quotes(quote, expected):
    got = [(code, spec) for (_, _, code, spec) in extract_refs_from_quote(quote)]
    assert got == expected


def test_inline_ref_offsets():
    s = "dei dreiv med fjordfiske(Fj.Skr III,42)"
    refs = extract_refs_from_quote(s)
    assert refs == [(24, len(s), "Fj.Skr", "III,42")]


def test_json_walkers_agree_with_typed_extraction(spark):
    """The raw-JSON tree walk (E6 UDF path) and the typed-schema native path
    must agree on the fixture corpus."""
    for fx in [FX.DEEP_ARTICLE, FX.BIBLIOGRAPHY_ARTICLE, FX.RELATED_IN_DEFINITIONS]:
        walked = collect_bibl_ids(fx)
        typed = _extract(spark, fx, {"ids": X.all_bibl_ids_col})["ids"]
        assert walked == typed, f"bibl_ids diverge: {walked} vs {typed}"
        walked_rel = find_related_article_ids(fx)
        typed_rel = _extract(spark, fx, {"ids": X.related_article_ids_col})["ids"]
        assert walked_rel == typed_rel, f"related diverge: {walked_rel} vs {typed_rel}"


def test_walk_udfs_run(spark):
    from worker_spark.functions.json_walk import walk_bibl_ids_udf, walk_related_ids_udf

    df = spark.createDataFrame(
        [(json.dumps(FX.DEEP_ARTICLE),)], schema="doc: string"
    ).select(
        walk_bibl_ids_udf("doc").alias("bibl"), walk_related_ids_udf("doc").alias("rel")
    )
    row = df.collect()[0]
    assert row["bibl"] == [100, 200, 300, 301]
    assert row["rel"] == [5001, 2002]


def test_depth_bound_guard():
    from worker_spark.functions.json_walk import assert_depth_bound, definition_depth
    from worker_spark.schemas import MAX_DEF_DEPTH

    assert definition_depth({}) == 0
    assert definition_depth(FX.DEEP_ARTICLE) == 3
    assert_depth_bound(FX.DEEP_ARTICLE, MAX_DEF_DEPTH)  # within bound

    too_deep = {"body": {"definitions": [{"sub_definitions": [{"sub_definitions": [
        {"sub_definitions": [{"sub_definitions": [{}]}]}]}]}]}}
    assert definition_depth(too_deep) == 5
    with pytest.raises(ValueError, match="exceeds the typed-schema unroll"):
        assert_depth_bound(too_deep, MAX_DEF_DEPTH)
