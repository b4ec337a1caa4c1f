"""Sync-machinery queries: the outbox/invalidation operators run against
the driver's generic tables (oracle-checked), plus a fixture-driven
end-to-end sync tick (rows-only)."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.plans import outbox as OB
from worker_spark.plans import sync as S
from worker_spark.queries import register
from worker_spark.sources import load_table


@register(
    "outbox_dedup_append",
    """
    WITH existing AS (
        SELECT 'fetch_article' AS job_type,
               (event_id % 500)::VARCHAR AS job_key,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE ts END AS processed_at
        FROM events WHERE event_type = 'click'
    ), incoming AS (
        SELECT DISTINCT 'fetch_article' AS job_type, user_id::VARCHAR AS job_key
        FROM events WHERE event_type = 'view'
    )
    SELECT i.job_type, i.job_key
    FROM incoming i
    WHERE NOT EXISTS (
        SELECT 1 FROM existing e
        WHERE e.job_type = i.job_type AND e.job_key = i.job_key
          AND e.processed_at IS NULL
    )
    """,
    doc="T1 transactional-outbox insert dedup: a job is appended only when "
    "no unprocessed row shares its (job_type, job_key) "
    "(src/storage.rs:674-687).",
)
def q_outbox_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    existing = e.filter(F.col("event_type") == "click").select(
        F.lit("fetch_article").alias("job_type"),
        (F.col("event_id") % 500).cast("string").alias("job_key"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("timestamp"))
        .otherwise(F.col("ts"))
        .alias("processed_at"),
    )
    incoming = (
        e.filter(F.col("event_type") == "view")
        .select(
            F.lit("fetch_article").alias("job_type"),
            F.col("user_id").cast("string").alias("job_key"),
        )
        .distinct()
    )
    return OB.dedup_against_unprocessed(incoming, existing)


@register(
    "reverse_invalidation",
    """
    WITH articles AS (
        SELECT 'no' AS dictionary, o_orderkey AS id,
               CASE WHEN o_orderkey % 13 = 0 THEN 'pending_fetch' ELSE 'idle' END AS sync_status
        FROM orders
    ), links AS (
        SELECT DISTINCT 'no' AS dictionary, l_orderkey AS article_id, l_partkey AS bibl_id
        FROM lineitem
    ), changed AS (
        SELECT p_partkey AS id FROM part WHERE p_partkey % 97 = 0
    )
    SELECT a.dictionary, a.id
    FROM articles a
    WHERE a.sync_status = 'idle'
      AND EXISTS (SELECT 1 FROM links l JOIN changed c ON l.bibl_id = c.id
                  WHERE l.dictionary = a.dictionary AND l.article_id = a.id)
    """,
    doc="J7 reverse-dependency invalidation: idle articles referencing a "
    "changed dimension id flip to pending_index "
    "(src/storage.rs:378-413).",
)
def q_reverse_invalidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    articles = o.select(
        F.lit("no").alias("dictionary"),
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("pending_fetch"))
        .otherwise(F.lit("idle"))
        .alias("sync_status"),
    )
    links = li.select(
        F.lit("no").alias("dictionary"),
        F.col("l_orderkey").alias("article_id"),
        F.col("l_partkey").alias("bibl_id"),
    ).distinct()
    changed = p.filter(F.col("p_partkey") % 97 == 0).select(F.col("p_partkey").alias("id"))
    return S.invalidation_job(articles, links, changed, "bibl_id")


@register(
    "sync_outbox_tick",
    """
    WITH list(dictionary, article_id, revision, updated_at) AS (
        VALUES ('no', 1, 2, 't1'), ('no', 2, 1, 't2'), ('no', 3, 1, 't3'), ('bm', 9, 1, 't9')
    ), db(dictionary, id, revision, updated_at, sync_status) AS (
        VALUES ('no', 1, 1, 't1', 'idle'), ('no', 2, 1, 't2', 'idle'), ('no', 4, 1, 't4', 'idle')
    ), outbox(id, job_type, job_key, processed_at) AS (
        VALUES (1, 'fetch_article', 'no:3', NULL)
    ), diff AS (
        SELECT coalesce(l.dictionary, d.dictionary) AS dictionary,
               coalesce(l.article_id, d.id) AS article_id,
               CASE
                 WHEN d.id IS NULL THEN 'new'
                 WHEN l.article_id IS NOT NULL AND l.revision = d.revision
                      AND l.updated_at = d.updated_at THEN 'unchanged'
                 WHEN l.article_id IS NOT NULL AND d.sync_status = 'idle' THEN 'changed'
                 WHEN l.article_id IS NOT NULL THEN 'skip_inflight'
                 ELSE 'missing'
               END AS classification
        FROM list l FULL OUTER JOIN db d
          ON l.dictionary = d.dictionary AND l.article_id = d.id
    ), new_jobs AS (
        SELECT 'fetch_article' AS job_type, dictionary || ':' || article_id AS job_key
        FROM diff WHERE classification IN ('new', 'changed')
    ), deduped AS (
        SELECT n.* FROM new_jobs n
        WHERE NOT EXISTS (SELECT 1 FROM outbox o
                          WHERE o.job_type = n.job_type AND o.job_key = n.job_key
                            AND o.processed_at IS NULL)
    ), appended AS (
        SELECT CAST((SELECT max(id) FROM outbox)
               + row_number() OVER (ORDER BY job_type, job_key) AS BIGINT) AS id,
               job_type, job_key
        FROM deduped
        UNION ALL
        SELECT CAST(id AS BIGINT), job_type, job_key FROM outbox WHERE processed_at IS NULL
    )
    SELECT id, job_type, job_key FROM appended ORDER BY id
    """,
    doc="§3.1 steps 2-8 on the fixture corpus: list-vs-DB diff -> "
    "fetch_article outbox rows (T1 dedup, monotone ids) -> budgeted FIFO "
    "drain (T2). The oracle replays diff+dedup+id assignment in SQL; "
    "stage goldens in tests/test_sync_pipeline.py.",
)
def q_sync_outbox_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.schemas import ARTICLE_LIST, JOB_OUTBOX

    lst = spark.createDataFrame(
        [
            ("no", 1, "a", 2, "t1"),
            ("no", 2, "b", 1, "t2"),
            ("no", 3, "c", 1, "t3"),
            ("bm", 9, "d", 1, "t9"),
        ],
        schema=ARTICLE_LIST,
    ).select("dictionary", "article_id", "revision", "updated_at")
    db = spark.createDataFrame(
        [("no", 1, 1, "t1", "idle"), ("no", 2, 1, "t2", "idle"), ("no", 4, 1, "t4", "idle")],
        schema="dictionary: string, id: bigint, revision: bigint, updated_at: string, sync_status: string",
    )
    outbox = spark.createDataFrame(
        [(1, "fetch_article", "no:3", "{}", datetime.datetime(2026, 1, 1), None)],
        schema=JOB_OUTBOX,
    )
    diff = S.diff_job(lst, db)
    new_jobs = S.fetch_jobs_from_diff(diff)
    merged = OB.append_jobs(outbox, new_jobs)
    drained = OB.drain_budgeted(merged, "fetch_article", budget=10)
    return drained.select("id", "job_type", "job_key")


@register(
    "outbox_dashboard",
    """
    WITH outbox AS (
        SELECT event_id AS id, event_type AS job_type,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE ts END AS processed_at
        FROM events
    ), now_ref AS (SELECT max(ts) AS now FROM events)
    SELECT job_type,
           count(*) FILTER (WHERE processed_at IS NULL) AS n_pending,
           count(*) FILTER (WHERE processed_at >= (SELECT now FROM now_ref) - INTERVAL 1 HOUR)  AS n_done_hour,
           count(*) FILTER (WHERE processed_at >= (SELECT now FROM now_ref) - INTERVAL 24 HOURS) AS n_done_day,
           count(*) AS n_total
    FROM outbox
    GROUP BY job_type
    """,
    doc="A1/T12 ops dashboard: per-job-type pending / last-hour / last-day "
    "counts (src/web.rs:638-670), 'now' pinned to the data max for "
    "determinism.",
)
def q_outbox_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    outbox = e.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("job_type"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("timestamp"))
        .otherwise(F.col("ts"))
        .alias("processed_at"),
    )
    now = e.agg(F.max("ts").alias("now"))
    return (
        outbox.crossJoin(F.broadcast(now))
        .groupBy("job_type")
        .agg(
            F.count(F.when(F.col("processed_at").isNull(), 1)).alias("n_pending"),
            F.count(
                F.when(
                    F.col("processed_at") >= F.col("now") - F.expr("INTERVAL 1 HOURS"), 1
                )
            ).alias("n_done_hour"),
            F.count(
                F.when(
                    F.col("processed_at") >= F.col("now") - F.expr("INTERVAL 24 HOURS"), 1
                )
            ).alias("n_done_day"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "place_crawl_closure",
    """
    WITH RECURSIVE edges AS (
        SELECT DISTINCT o_orderkey // 10 AS parent_id, o_orderkey AS child_id
        FROM orders
    ),
    reach AS (
        SELECT CAST(s.id AS BIGINT) AS id, 0 AS depth
        FROM (VALUES (1), (2), (3)) s(id)
        UNION ALL
        SELECT e.child_id AS id, r.depth + 1 AS depth
        FROM reach r JOIN edges e ON e.parent_id = r.id
        WHERE r.depth < 20
    )
    SELECT id, CAST(min(depth) AS INT) AS depth FROM reach GROUP BY id
    """,
    doc="E7/§3.2 recursive crawl closure (src/sync_service.rs:924-935): "
    "BFS join-until-fixpoint over an edge relation, oracle-checked against "
    "a bounded-depth recursive CTE. The edge set is the decimal-shift tree "
    "over orderkeys (parent = key div 10) — a real multi-level graph "
    "deterministically derivable in both engines; depth = first-discovery "
    "(= shortest-path) level.",
)
def q_place_crawl_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.plans.crawl import crawl_closure

    o = load_table(spark, sf_dir, "orders")
    edges = o.select(
        F.expr("o_orderkey div 10").alias("parent_id"),
        F.col("o_orderkey").alias("child_id"),
    ).distinct()
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "id: bigint")
    return crawl_closure(seeds, edges, max_depth=20).select(
        "id", F.col("depth").cast("int").alias("depth")
    )


@register(
    "url_build_redact",
    """
    SELECT s_suppkey,
           'https://ord.uib.no/no/article/' || s_suppkey::VARCHAR || '.json' AS article_url,
           'https://clarino.uib.no/ordbank-api-prod/bibl?code='
               || replace(s_name, '#', '%23') AS bibl_url,
           regexp_replace(
               CASE WHEN s_suppkey % 3 = 0
                    THEN 'postgres://worker:' || s_name || '@db.internal:5432/worker'
                    WHEN s_suppkey % 3 = 1
                    THEN 'postgres://db.internal:5432/worker'
                    ELSE 'db.internal:5432' END,
               '^(.*?://)[^@]*@', '\\1***@') AS redacted_url
    FROM supplier
    """,
    doc="F8/F11 URL building + credential redaction "
    "(src/uib_client.rs:201-250, src/main.rs:171-180): article fetch URLs, "
    "percent-encoded bibliography lookup URLs (the supplier-name corpus "
    "exercises '#' -> %23; the general RFC-3986 encoder is golden-tested), "
    "and userinfo redaction with no-credential / no-scheme pass-through.",
)
def q_url_build_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.functions.urls import (
        article_url_col,
        bibl_by_code_url_col,
        redact_url_credentials_col,
    )

    s = load_table(spark, sf_dir, "supplier")
    raw_url = (
        F.when(
            F.col("s_suppkey") % 3 == 0,
            F.concat(
                F.lit("postgres://worker:"), F.col("s_name"), F.lit("@db.internal:5432/worker")
            ),
        )
        .when(F.col("s_suppkey") % 3 == 1, F.lit("postgres://db.internal:5432/worker"))
        .otherwise(F.lit("db.internal:5432"))
    )
    return s.select(
        "s_suppkey",
        article_url_col(F.lit("no"), F.col("s_suppkey")).alias("article_url"),
        bibl_by_code_url_col(F.col("s_name")).alias("bibl_url"),
        redact_url_credentials_col(raw_url).alias("redacted_url"),
    )
