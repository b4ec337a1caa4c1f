"""Profiling query: per-column ANALYZE statistics over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators.profile import PROFILE_PREFIX, table_profile
from worker_spark.queries import register
from worker_spark.queries.sketchq import quantile_sketch_oracle
from worker_spark.sources import load_table

_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_PER_COL = "\n    UNION ALL\n".join(
    f"""    SELECT '{c}' AS column,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           substr(CAST(min({c}) AS VARCHAR), 1, {PROFILE_PREFIX})
               AS min_prefix,
           substr(CAST(max({c}) AS VARCHAR), 1, {PROFILE_PREFIX})
               AS max_prefix
    FROM documents"""
    for c in _COLS
)


@register(
    "documents_profile",
    _PER_COL,
    doc="Table profiling (the ANALYZE surface): row/null/exact-distinct "
    "counts and min/max 32-char prefixes for every documents column, "
    "computed in ONE aggregation pass and unpivoted to a row per column. "
    "Profiles feed planner thresholds and ingest quality gates; the cost "
    "at scale is the single scan.",
)
def q_documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return table_profile(docs, _COLS)


@register(
    "doc_length_quantiles",
    quantile_sketch_oracle("documents", "lang", "doc_id", "n_chars"),
    doc="Distribution profiling via the deterministic quantile sketch "
    "(sketches.quantile_sketch_audit) as a first-class ANALYZE surface: "
    "p50/p90/p99 document length per language with per-group rank-error "
    "audit. At sf0.01 every language group fits the k=512 sketch (exact "
    "path); at sf0.1 every group exceeds it (sampled path) — the same "
    "query exercises both regimes. Scale shape: bounded two-level agg, "
    "no Sort/Window (plan-asserted for the operator).",
)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.sketches import quantile_sketch_audit

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return quantile_sketch_audit(docs, "n_chars", "doc_id", "lang")


_JSP_BCAST = 1000  # broadcast-side row threshold (both engines)
_JSP_SALT = 0.02  # hottest-key output share that triggers salting


@register(
    "join_skew_profile",
    f"""
    WITH lc AS (
        SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_left
        FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
        GROUP BY 1
    ),
    rc AS (
        SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_right
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
        GROUP BY 1
    ),
    pk AS (
        SELECT lc.key, n_left, n_right, n_left * n_right AS contribution
        FROM lc JOIN rc USING (key)
    ),
    summ AS (
        SELECT CAST(count(*) AS BIGINT) AS match_keys,
               CAST(sum(contribution) AS BIGINT) AS est_join_rows,
               max(contribution) AS maxc
        FROM pk
    ),
    ls AS (
        SELECT CAST(sum(n_left) AS BIGINT) AS left_rows,
               CAST(count(*) AS BIGINT) AS left_keys FROM lc
    ),
    rs AS (
        SELECT CAST(sum(n_right) AS BIGINT) AS right_rows,
               CAST(count(*) AS BIGINT) AS right_keys FROM rc
    ),
    top AS (
        SELECT * FROM (
            SELECT pk.*,
                   CAST(row_number() OVER (
                       ORDER BY contribution DESC, key ASC) AS INT) AS rank
            FROM pk
        ) WHERE rank <= 10
    )
    SELECT t.key, t.n_left, t.n_right, t.contribution,
           CAST(t.contribution AS DOUBLE) / est_join_rows AS share,
           t.rank,
           left_rows, right_rows, left_keys, right_keys,
           match_keys, est_join_rows,
           CAST(maxc AS DOUBLE) / est_join_rows AS max_share,
           CASE WHEN right_rows <= {_JSP_BCAST} THEN 'broadcast_right'
                WHEN left_rows <= {_JSP_BCAST} THEN 'broadcast_left'
                WHEN CAST(maxc AS DOUBLE) / est_join_rows > {_JSP_SALT!r}
                     THEN 'salt_hot_keys'
                ELSE 'shuffle_join' END AS strategy
    FROM top t, summ, ls, rs
    """,
    doc="Pre-join cardinality/skew profile (skew.join_skew_profile) for "
    "the view-events x purchase-events user join: exact join output "
    "size from per-key count tables (never the joined rows), top-10 "
    "hottest keys with their output share, and a deterministic strategy "
    "verdict (broadcast under 1000 rows / salt when the hottest key owns "
    ">2% of the output / shuffle otherwise). The thresholds are chosen "
    "so sf0.001 exercises the broadcast branch and sf0.01 the "
    "salt-or-shuffle branch. Scale: two map-side counts + a "
    "distinct-key join + TakeOrdered — profiling a 10^13-row join "
    "costs two scans.",
)
def q_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from worker_spark.operators.skew import join_skew_profile

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    return join_skew_profile(
        views,
        buys,
        "user_id",
        top_n=10,
        broadcast_rows=_JSP_BCAST,
        salt_share=_JSP_SALT,
    )


def _zorder_oracle() -> str:
    from worker_spark.operators import zorder as Z

    bits, top = Z.Z_BITS, (1 << Z.Z_BITS) - 1
    zwidth, bk = 1 << (2 * Z.Z_BITS), Z.Z_BUCKETS
    morton = " + ".join(
        f"(((n1 >> {j}) & 1) << {2 * j + 1}) + (((n2 >> {j}) & 1) << {2 * j})"
        for j in range(bits)
    )
    return f"""
    WITH base AS (
        SELECT CAST(user_id AS BIGINT) AS v1,
               CAST(floor(epoch(ts)) AS BIGINT) AS v2
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    bounds AS (
        SELECT min(v1) AS lo1, max(v1) AS hi1,
               min(v2) AS lo2, max(v2) AS hi2
        FROM base
    ),
    norm AS (
        SELECT CAST(floor(((v1 - lo1) * {top}) / greatest(hi1 - lo1, 1))
                    AS BIGINT) AS n1,
               CAST(floor(((v2 - lo2) * {top}) / greatest(hi2 - lo2, 1))
                    AS BIGINT) AS n2
        FROM base, bounds
    ),
    keyed AS (SELECT n1, n2, {morton} AS z FROM norm),
    tagged AS (
        SELECT n1, n2, 'linear_user_id' AS layout,
               CAST(floor((n1 * {bk}) / {top + 1}) AS BIGINT) AS b
        FROM keyed
        UNION ALL
        SELECT n1, n2, 'zorder' AS layout,
               CAST(floor((z * {bk}) / {zwidth}) AS BIGINT) AS b
        FROM keyed
    ),
    per_bucket AS (
        SELECT layout, b,
               min(n1) AS lo1, max(n1) AS hi1,
               min(n2) AS lo2, max(n2) AS hi2
        FROM tagged GROUP BY 1, 2
    ),
    per_col AS (
        SELECT layout, 'user_id' AS column, lo1 AS lo, hi1 AS hi
        FROM per_bucket
        UNION ALL
        SELECT layout, 'epoch_s' AS column, lo2 AS lo, hi2 AS hi
        FROM per_bucket
    ),
    counted AS (
        SELECT layout, "column",
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(hi - lo) AS BIGINT) AS span_sum,
               CAST(sum(CASE WHEN {top // 2} < lo OR {top // 2} > hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS pruned
        FROM per_col GROUP BY 1, 2
    )
    SELECT layout, "column", n_buckets,
           CAST(span_sum AS DOUBLE) / CAST(n_buckets * {top} AS DOUBLE)
               AS avg_span,
           CAST(pruned AS DOUBLE) / CAST(n_buckets AS DOUBLE)
               AS prune_frac
    FROM counted
    """


@register(
    "events_zorder_layout",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering audit (zorder.zorder_layout_stats) "
    "over events (user_id x event time): per-bucket min/max span and "
    "mid-range point-probe prune fraction for the linear user_id layout "
    "vs the bit-interleaved z-order layout. The multi-column data-"
    "skipping story in 4 numbers: linear clusters user_id perfectly and "
    "time not at all; z-order bounds BOTH near B^(-1/2). Single pass "
    "(explode layout tags -> one bounded groupBy), exact integer "
    "normalize/interleave so both engines agree bit-for-bit; "
    "zorder_repartition is the write-path twin that range-partitions on "
    "the same key.",
)
def q_events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from worker_spark.operators.zorder import zorder_layout_stats

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("epoch_s")
    )
    return zorder_layout_stats(ev, "user_id", "epoch_s")
