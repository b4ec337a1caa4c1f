"""Streaming query in the correctness surface: the windowed stats stream
(T12) executed as a REAL Structured Streaming job — file source,
watermark, tumbling window, memory sink, availableNow trigger — whose
drained result is returned as a batch DataFrame and hash-checked against
a DuckDB tumbling-window aggregation."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.queries import register
from worker_spark.sources import load_table


@register(
    "streaming_event_window_counts",
    """
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="T12 stats stream run as an actual Structured Streaming job "
    "(parquet file source -> watermark -> 1-minute tumbling window -> "
    "memory sink, availableNow); the drained windows hash-match DuckDB's "
    "batch tumbling-window aggregation.",
)
def q_streaming_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    events = load_table(spark, sf_dir, "events")
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    sink = f"stream_out_{uuid.uuid4().hex[:8]}"
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(events.schema).parquet(src_dir)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        if not finished:
            q.stop()
            raise TimeoutError(
                "streaming_event_window_counts: availableNow drain exceeded 300s"
            )
        # materialize off the memory sink so the temp view and source/
        # checkpoint dirs can be dropped before returning
        result = spark.table(sink).select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        ).localCheckpoint(eager=True)
        return result
    finally:
        spark.catalog.dropTempView(sink)
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
