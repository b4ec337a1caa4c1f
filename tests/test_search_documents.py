"""End-to-end test of the §3.3 reindex slice: fixture articles ->
article_search_documents, asserting the reference's document-assembly
semantics (/root/reference/src/meili.rs:187-252, tests at :669-727;
bibliography categorization test src/extraction.rs:1180-1248)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from worker_spark import fixtures as FX
from worker_spark.plans.search_documents import (
    bibliography_documents,
    build_search_documents,
    place_documents,
)
from worker_spark.schemas import (
    ARTICLE_DATA,
    ARTICLE_PLACE,
    BIBLIOGRAPHY,
    CONCEPTS,
    PLACES,
)

TS = datetime.datetime(2026, 1, 1)


def _articles_df(spark, rows):
    schema = f"dictionary: string, id: bigint, data: {ARTICLE_DATA.simpleString()}"
    return spark.createDataFrame(rows, schema=schema)


def _dims(spark):
    bib = spark.createDataFrame(
        [(i, c, a, t, y, [], TS, "idle", TS) for (i, c, a, t, y) in FX.BIB_ROWS]
        + [(300, "AttCode", "Att Author", "", "1900", [], TS, "idle", TS)],
        schema=BIBLIOGRAPHY,
    )
    places = spark.createDataFrame(
        [
            (11, "Nordfjell", "Nordfjell i Fjella", "bygd", None, 0, None, 0, TS, "idle", TS),
            (12, "Sørdal", "", "dal", 11, 1, "4601", 0, TS, "idle", TS),
            (13, "Vestmark", "Vestmark ytre", "mark", None, 0, None, 0, TS, "idle", TS),
        ],
        schema=PLACES,
    )
    article_place = spark.createDataFrame(
        [
            ("no", 1, 11, "dialect"),
            ("no", 1, 12, "dialect"),
            ("no", 1, 11, "attestation"),
            ("no", 1, 13, "attestation"),
        ],
        schema=ARTICLE_PLACE,
    )
    concepts = spark.createDataFrame(
        [("no", "norr.", "norrønt")], schema=CONCEPTS
    )
    return bib, places, article_place, concepts


def test_empty_article_document(spark):
    """src/meili.rs:682-699 — empty data -> empty arrays / '' / false."""
    arts = _articles_df(spark, [("nn", 7, {})])
    bib, places, ap, concepts = _dims(spark)
    doc = build_search_documents(arts, bib, places, ap.limit(0), concepts).collect()[0]
    assert doc["doc_id"] == "nn_7"
    assert doc["article_id"] == 7
    assert doc["dictionary"] == "nn"
    assert doc["lemmas"] == []
    assert doc["inflections"] == []
    assert doc["etymology_text"] == ""
    assert doc["definition_text"] == ""
    assert doc["has_split_inf"] is False
    assert doc["bibliography_codes"] == []
    assert doc["place_names"] == []


def test_full_document_assembly(spark):
    arts = _articles_df(spark, [("no", 1, FX.DEEP_ARTICLE)])
    bib, places, ap, concepts = _dims(spark)
    doc = build_search_documents(arts, bib, places, ap, concepts).collect()[0]

    assert doc["doc_id"] == "no_1"
    assert doc["lemmas"] == ["djupord"]
    assert doc["etymology_text"] == "frå norrønt"
    assert doc["etymology_languages"] == ["norr."]
    assert doc["pronunciation_text"] == "ˈjʉːpuːr"
    assert doc["dialect_forms"] == ["jupor"]
    assert doc["dialect_places"] == ["Nordfjell"]  # show==1 only
    assert doc["definition_text"] == "eit djupt ord i overført tyding"
    assert doc["example_text"] == (
        "han sa eit djupord(Fj.Skr III,42) djupast i fjorden(HaBrev)"
    )
    assert doc["written_forms"] == ["diupord"]
    assert doc["sub_article_lemmas"] == ["grunnord"]

    # bibliography categories (J4): older=200 -> FiktB; written=100 -> FiktA;
    # attestation vis==1 -> 300; all = sorted {100,200,300,301}, 301 absent
    # from the dimension -> dropped by the join
    assert doc["older_source_codes"] == ["FiktB"]
    assert doc["written_form_source_codes"] == ["FiktA"]
    assert doc["attestation_source_codes"] == ["AttCode"]
    assert doc["attestation_source_titles"] == []  # empty title dropped
    assert doc["bibliography_codes"] == ["FiktA", "FiktB", "AttCode"]
    assert doc["bibliography_years"] == ["2000", "2001", "1900"]

    # place categories (J5/J6): dialect [11,12], attestation [11,13],
    # union sorted [11,12,13]; display name falls back to place_name when
    # full name is empty (id 12)
    assert doc["dialect_place_names"] == ["Nordfjell i Fjella", "Sørdal"]
    assert doc["attestation_place_names"] == ["Nordfjell i Fjella", "Vestmark ytre"]
    assert doc["place_names"] == ["Nordfjell i Fjella", "Sørdal", "Vestmark ytre"]
    assert doc["place_codes"] == ["Nordfjell", "Sørdal", "Vestmark"]
    assert doc["place_types"] == ["bygd", "dal", "mark"]


def test_bibliography_and_place_documents(spark):
    bib, places, _, _ = _dims(spark)
    assert bibliography_documents(bib).columns == ["id", "code", "author", "title", "year"]
    assert place_documents(places).count() == 3


def test_document_count_and_plan(spark):
    """Two dictionaries, three articles; also sanity-check the physical plan
    broadcasts the dimensions."""
    arts = _articles_df(
        spark,
        [
            ("no", 1, FX.DEEP_ARTICLE),
            ("bm", 2, FX.NOUN_DUAL_PARADIGM),
            ("nn", 3, {}),
        ],
    )
    bib, places, ap, concepts = _dims(spark)
    docs = build_search_documents(arts, bib, places, ap, concepts)
    assert docs.count() == 3
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
