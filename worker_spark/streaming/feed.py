"""Shared plumbing for the incremental-index maintenance streams (the
inverted index, the IVF vector index and the SimHash dedup index are
one dataflow shape: a parquet file directory as the change feed, a
foreachBatch MERGE as the consumer)."""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def _refuse_map_columns(schema: T.DataType, path: str = "") -> None:
    """Recursive MapType sweep over a schema (struct/array nesting
    included) — see last_wins' docstring for why maps cannot be
    fingerprinted with to_json."""
    if isinstance(schema, T.MapType):
        raise ValueError(
            f"last_wins cannot fingerprint MapType column {path or '<root>'}: "
            "to_json map key order is not canonical, so replayed batches "
            "could elect different winners. Serialize the map to a sorted "
            "array<struct<key,value>> column before the feed."
        )
    if isinstance(schema, T.StructType):
        for f in schema.fields:
            _refuse_map_columns(f.dataType, f"{path}.{f.name}" if path else f.name)
    elif isinstance(schema, T.ArrayType):
        _refuse_map_columns(schema.elementType, f"{path}[]")


def last_wins(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One row per key tuple: LAST version wins — the reference index
    sink's add_or_replace-by-id semantics (src/indexing.rs:61-115)
    applied WITHIN a micro-batch. Without this, a trigger that merges a
    draft file and its correction (max_files_per_trigger=None, or a
    backlog drained in one availableNow batch) carries two versions of
    one key, and every apply_batch body silently double-applies: the
    vector index re-expands its per-key assignment into duplicate
    cells/vecmap rows, the retrieval index sums both versions' tf, the
    dedup index merges both versions' shingles (round-9 advice,
    medium).

    "Last" inside one Spark micro-batch: the file source exposes no
    per-row arrival order, so version order is the lexicographic
    source-file order (``input_file_name()`` — later feed files sort
    after earlier ones under any sortable batch naming; the empty
    string for non-file frames), tie-broken by a deterministic row
    fingerprint so a REPLAYED batch always elects the same winner (the
    idempotent-replay contract every index depends on). Within-FILE
    duplicates of a key have no defined version order anywhere — the
    fingerprint makes that choice stable rather than meaningful.

    One map-side-combinable max_by agg on the key — no window, no
    join; cost O(batch), hot keys collapse to one partial per task.
    The order columns are materialized in a projection BELOW the agg:
    input_file_name() is non-deterministic to Catalyst and may not
    appear inside an aggregate function directly.

    MapType columns are REFUSED up front (round-10 advice): the
    fingerprint is md5(to_json(struct(*))) and to_json's map key
    order is not canonical, so a replayed batch could serialize the
    same row differently and elect a DIFFERENT winner — silently
    breaking the idempotent-replay contract. No current feed schema
    carries a map; the guard keeps a future one from compiling into
    a latent replay divergence instead of a loud error here."""
    _refuse_map_columns(df.schema)
    cols = df.columns
    tagged = df.select(
        *cols,
        F.input_file_name().alias("_src"),
        F.md5(F.to_json(F.struct(*cols))).alias("_fp"),
    )
    return (
        tagged.groupBy(*[F.col(k) for k in key_cols])
        .agg(
            F.max_by(
                F.struct(*cols), F.struct(F.col("_src"), F.col("_fp"))
            ).alias("_row")
        )
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )


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
