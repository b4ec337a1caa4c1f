"""Shared plumbing for the incremental-index maintenance streams (the
inverted index, the IVF vector index and the SimHash dedup index are
one dataflow shape: a parquet file directory as the change feed, a
foreachBatch MERGE as the consumer)."""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def file_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    schema: T.StructType,
    checkpoint_name: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """ONE definition of the feed topology (review finding: three
    near-identical wrappers): each new parquet file under ``feed_dir``
    is a micro-batch, drained into ``apply_batch`` with a checkpointed
    source offset so restarts resume instead of reprocessing."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    writer = (
        stream.writeStream.outputMode("update")
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, checkpoint_name)
        )
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
