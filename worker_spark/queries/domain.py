"""Domain-pipeline queries: the reference's own data model run on the
fixture corpus ported from its unit tests (tests/fixtures.py).

These take fixture inputs (created in-memory — the driver's DuckDB views
only cover the generic tables), so they are registered WITHOUT oracle SQL:
the driver records the weaker rows-only check, and the full golden
assertions live in tests/test_extraction.py and
tests/test_search_documents.py.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.queries import register
from worker_spark.schemas import (
    ARTICLE_DATA,
    ARTICLE_PLACE,
    BIBLIOGRAPHY,
    CONCEPTS,
    PLACES,
)

_TS = datetime.datetime(2026, 1, 1)


def _fixture_frames(spark: SparkSession):
    from worker_spark import fixtures as FX

    arts = spark.createDataFrame(
        [
            ("no", 1, FX.DEEP_ARTICLE),
            ("no", 4, FX.BIBLIOGRAPHY_ARTICLE),
            ("bm", 2, FX.NOUN_DUAL_PARADIGM),
            ("bm", 5, FX.ETYMOLOGY_TEMPLATE),
            ("nn", 3, {}),
            ("nn", 6, FX.VERB_SPLIT_INF),
            ("no", 8, FX.DIALECT_SHOW_FILTER),
        ],
        schema=f"dictionary: string, id: bigint, data: {ARTICLE_DATA.simpleString()}",
    )
    bib = spark.createDataFrame(
        [(i, c, a, t, y, [], _TS, "idle", _TS) for (i, c, a, t, y) in FX.BIB_ROWS]
        + [(300, "AttCode", "Att Author", "", "1900", [], _TS, "idle", _TS)],
        schema=BIBLIOGRAPHY,
    )
    places = spark.createDataFrame(
        [
            (11, "Nordfjell", "Nordfjell i Fjella", "bygd", None, 0, None, 0, _TS, "idle", _TS),
            (12, "Sørdal", "", "dal", 11, 1, "4601", 0, _TS, "idle", _TS),
            (13, "Vestmark", "Vestmark ytre", "mark", None, 0, None, 0, _TS, "idle", _TS),
        ],
        schema=PLACES,
    )
    article_place = spark.createDataFrame(
        [
            ("no", 1, 11, "dialect"),
            ("no", 1, 12, "dialect"),
            ("no", 1, 11, "attestation"),
            ("no", 1, 13, "attestation"),
            ("no", 8, 11, "dialect"),
        ],
        schema=ARTICLE_PLACE,
    )
    concepts = spark.createDataFrame([("no", "norr.", "norrønt"), ("bm", "norr.", "norrønt")], schema=CONCEPTS)
    return arts, bib, places, article_place, concepts


@register(
    "article_search_documents",
    None,
    doc="§3.3 reindex slice: fixture articles x bibliography x places x "
    "concepts -> the 45-field search-document table (src/meili.rs:187-252). "
    "Golden-asserted in tests/test_search_documents.py; rows-only here.",
)
def q_article_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.plans.search_documents import build_search_documents

    arts, bib, places, ap, concepts = _fixture_frames(spark)
    return build_search_documents(arts, bib, places, ap, concepts)


@register(
    "inline_ref_parse",
    None,
    doc="F1/F2 inline-reference parsing with byte offsets over the "
    "reference's own quote corpus (src/extraction.rs:1086-1151) -> "
    "inline_ref_parse rows (migrations/20260518113248). Golden-asserted "
    "in tests/test_extraction.py; rows-only here.",
)
def q_inline_ref_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark import fixtures as FX
    from worker_spark.functions.inline_refs import inline_refs_udf

    quotes = spark.createDataFrame(
        [("no", 100 + i, q) for i, (q, _) in enumerate(FX.QUOTE_CASES)],
        schema="dictionary: string, article_id: bigint, quote_content: string",
    )
    return quotes.select(
        "dictionary",
        "article_id",
        "quote_content",
        F.explode(inline_refs_udf("quote_content")).alias("r"),
    ).select(
        "dictionary",
        "article_id",
        "quote_content",
        F.col("r.offset_start").alias("offset_start"),
        F.col("r.offset_end").alias("offset_end"),
        F.col("r.code").alias("code"),
        F.col("r.spec").alias("spec"),
    )


@register(
    "article_analysis",
    None,
    doc="analyze_article (src/extraction.rs:746-773): primary lemma, "
    "all-depth bibl ids, dialect/attestation place ids, related article "
    "ids per article — the per-article analysis record the store job "
    "persists.",
)
def q_article_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark import extraction as X

    arts, _, _, _, _ = _fixture_frames(spark)
    d = F.col("data")
    return arts.select(
        "dictionary",
        "id",
        X.first_lemma_col(d).alias("primary_lemma"),
        X.all_bibl_ids_col(d).alias("bibl_ids"),
        X.dialect_place_ids_col(d).alias("dialect_place_ids"),
        X.attestation_place_ids_col(d).alias("attestation_place_ids"),
        X.related_article_ids_col(d).alias("related_article_ids"),
    )
