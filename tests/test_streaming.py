"""Streaming formulation tests: incremental outbox consumption with
checkpointed resume, and the windowed stats aggregation."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from worker_spark.schemas import JOB_OUTBOX
from worker_spark.streaming.pipeline import outbox_stream, queue_depth_stats, run_stage

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _write_outbox_file(spark, outbox_dir, rows):
    df = spark.createDataFrame(rows, schema=JOB_OUTBOX)
    df.coalesce(1).write.mode("append").parquet(outbox_dir)


def test_outbox_stream_incremental_consumption(spark, tmp_path):
    outbox_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    processed: list[tuple[int, str]] = []

    _write_outbox_file(
        spark,
        outbox_dir,
        [
            (1, "fetch_article", "no:1", "{}", TS, None),
            (2, "batch_index", "no:1", json.dumps({"article_keys": ["no:1"]}), TS, None),
        ],
    )

    def process(batch_df, epoch_id):
        for r in batch_df.select("id", "job_key").collect():
            processed.append((r["id"], r["job_key"]))

    q = run_stage(
        outbox_stream(spark, outbox_dir, max_files_per_trigger=1),
        "fetch_article",
        process,
        ckpt,
        available_now=True,
    )
    q.awaitTermination(120)
    assert processed == [(1, "no:1")]  # batch_index row filtered out

    # second tick: only NEW files are consumed (checkpoint = offset cursor)
    _write_outbox_file(
        spark, outbox_dir, [(3, "fetch_article", "no:2", "{}", TS, None)]
    )
    q2 = run_stage(
        outbox_stream(spark, outbox_dir, max_files_per_trigger=1),
        "fetch_article",
        process,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    assert processed == [(1, "no:1"), (3, "no:2")]


def test_queue_depth_stats_windowing(spark, tmp_path):
    outbox_dir = str(tmp_path / "outbox2")
    _write_outbox_file(
        spark,
        outbox_dir,
        [
            (1, "fetch_article", "no:1", "{}", TS, None),
            (2, "fetch_article", "no:2", "{}", TS + datetime.timedelta(seconds=30), None),
            (3, "batch_index", "no:1", "{}", TS + datetime.timedelta(minutes=2), None),
        ],
    )
    stats = queue_depth_stats(outbox_stream(spark, outbox_dir, None))
    q = (
        stats.writeStream.outputMode("complete")
        .format("memory")
        .queryName("qdepth")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["job_type"], r["window_start"]): r["n_jobs"]
        for r in spark.sql("select * from qdepth").collect()
    }
    assert rows[("fetch_article", TS)] == 2
    assert rows[("batch_index", TS + datetime.timedelta(minutes=2))] == 1
