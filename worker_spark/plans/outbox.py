"""T1-T4 — the transactional-outbox dataflow as DataFrame jobs.

Reference (/root/reference/src/outbox.rs, src/storage.rs:668-770,
migrations/20260521184716 + 20260526010803):

* T1 insert-dedup: a job row is appended only if no UNPROCESSED row with
  the same (job_type, job_key) exists (src/storage.rs:674-687).
* T2 budgeted drain: per job type, FIFO by id, budget = watermark - queue
  depth (src/outbox.rs:120-124, 176-182).
* T3 batch coalescing: batch_index rows drain under a running-sum cap and
  their key arrays merge into one deduped job (src/outbox.rs:128-162).
* T4 sweep: stale pending entities flip back / re-outbox; processed rows
  older than 1 h are GC'd (src/outbox.rs:285-435).

Job ids are explicit monotone sequence values (max(id) + row_number) —
``monotonically_increasing_id`` is per-partition and cannot provide the
FIFO drain order the outbox contract needs (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from worker_spark.operators.outbox_drain import drain_with_cap

JOB_TYPES = (
    "fetch_article",
    "batch_index",
    "fetch_bibliography",
    "fetch_place",
    "fetch_dictionary_metadata",
    "resolve_inline_code",
)


def dedup_against_unprocessed(new_jobs: DataFrame, outbox: DataFrame) -> DataFrame:
    """T1: drop new jobs whose (job_type, job_key) already sit unprocessed
    in the outbox; also dedup within the batch itself."""
    unprocessed = outbox.filter(F.col("processed_at").isNull()).select(
        "job_type", "job_key"
    )
    return (
        new_jobs.dropDuplicates(["job_type", "job_key"])
        .join(unprocessed, ["job_type", "job_key"], "left_anti")
    )


def assign_ids(new_jobs: DataFrame, outbox: DataFrame) -> DataFrame:
    """Monotone id assignment continuing the outbox sequence."""
    max_id = outbox.agg(F.coalesce(F.max("id"), F.lit(0)).alias("m"))
    w = Window.orderBy("job_type", "job_key")
    return (
        new_jobs.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(max_id))
        .withColumn("id", (F.col("m") + F.col("_rn")).cast("long"))
        .drop("_rn", "m")
    )


def append_jobs(outbox: DataFrame, new_jobs: DataFrame) -> DataFrame:
    """T1 write path: dedup -> assign ids -> stamp created_at -> union.
    ``new_jobs``: (job_type, job_key, payload)."""
    deduped = dedup_against_unprocessed(new_jobs, outbox)
    with_ids = assign_ids(deduped, outbox)
    stamped = with_ids.withColumn("created_at", F.current_timestamp()).withColumn(
        "processed_at", F.lit(None).cast("timestamp")
    )
    return outbox.unionByName(stamped.select(*outbox.columns))


def drain_budget(
    concurrency: int, queue_depth: int, watermark_multiplier: int = 3
) -> int:
    """T2 backpressure budget (src/outbox.rs:33,120-124): the watermark is
    ``multiplier x per-stage concurrency``; this tick may dispatch at most
    ``watermark - current queue depth`` jobs (never negative)."""
    return max(watermark_multiplier * concurrency - queue_depth, 0)


def drain_budgeted(outbox: DataFrame, job_type: str, budget: int) -> DataFrame:
    """T2: FIFO take of up to ``budget`` unprocessed rows of one type
    (src/outbox.rs:176-182). Deterministic ORDER BY id."""
    return (
        outbox.filter((F.col("job_type") == job_type) & F.col("processed_at").isNull())
        .orderBy("id")
        .limit(max(budget, 0))
    )


def drain_batch_index(outbox: DataFrame, target_keys: int = 5000) -> DataFrame:
    """T3: coalesced batch_index drain — rows in id order until the
    cumulative key count passes the target (>= 1 row), then one deduped
    key set (payload JSON carries {"article_keys": [...]})."""
    rows = outbox.filter(
        (F.col("job_type") == "batch_index") & F.col("processed_at").isNull()
    ).withColumn(
        "n_keys",
        F.greatest(
            F.size(F.from_json(F.col("payload"), "struct<article_keys:array<string>>")["article_keys"]),
            F.lit(1),
        ),
    )
    return drain_with_cap(rows, size_col="n_keys", id_col="id", target=target_keys)


def coalesced_batch_keys(drained: DataFrame) -> DataFrame:
    """The merged, deduped key set of a batch_index drain."""
    keys = drained.select(
        F.explode(
            F.coalesce(
                F.from_json(F.col("payload"), "struct<article_keys:array<string>>")[
                    "article_keys"
                ],
                F.array(F.col("job_key")),
            )
        ).alias("article_key")
    )
    return keys.distinct()


def mark_processed(outbox: DataFrame, drained_ids: DataFrame) -> DataFrame:
    """Set processed_at on the drained rows (idempotent re-apply safe)."""
    ids = drained_ids.select(F.col("id").alias("_did"))
    return (
        outbox.join(F.broadcast(ids), outbox["id"] == ids["_did"], "left")
        .withColumn(
            "processed_at",
            F.when(
                F.col("_did").isNotNull() & F.col("processed_at").isNull(),
                F.current_timestamp(),
            ).otherwise(F.col("processed_at")),
        )
        .drop("_did")
    )


def gc_processed(outbox: DataFrame, older_than_hours: int = 1) -> DataFrame:
    """T4 GC: drop processed rows older than the retention window
    (src/outbox.rs:304,430-432).

    Deviation from the reference (which relies on a Postgres sequence):
    the single highest-id row is always retained as the id high-water
    mark — assign_ids derives the next id from max(id), and GC'ing the
    max row would let new jobs reuse previously issued ids, breaking the
    monotone-id contract mark_processed's idempotence depends on."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {older_than_hours} HOURS")
    max_id = outbox.agg(F.coalesce(F.max("id"), F.lit(0)).alias("_max_id"))
    return (
        outbox.crossJoin(F.broadcast(max_id))
        .filter(
            F.col("processed_at").isNull()
            | (F.col("processed_at") >= cutoff)
            | (F.col("id") == F.col("_max_id"))
        )
        .drop("_max_id")
    )


def stale_pending(
    entities: DataFrame,
    status: str,
    stale_minutes: int = 5,
    limit: int = 500,
) -> DataFrame:
    """T4 sweep candidates: entities stuck in ``status`` for longer than the
    staleness window, deterministically ordered (the reference takes an
    unordered LIMIT — src/outbox.rs:311-345; we order by
    (status_changed_at, id), the §7.5-8 documented deviation)."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {stale_minutes} MINUTES")
    return (
        entities.filter(
            (F.col("sync_status") == status) & (F.col("status_changed_at") < cutoff)
        )
        .orderBy("status_changed_at", "id")
        .limit(limit)
    )
