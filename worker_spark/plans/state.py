"""Parquet-backed mutable state for the sync pipeline.

The reference keeps state in Postgres with row-level upserts and
transactional outbox writes (src/storage.rs:118-245, 668-688). Without a
transactional table format in this environment, state tables are plain
parquet directories updated by read-merge-overwrite with an atomic
directory swap; every job is idempotent (MERGE semantics re-applied on
replay), which is the §7.5-5 documented relaxation: exactly-once handoff
becomes at-least-once + idempotent apply — the same guarantee the
reference's consumers already assume (src/sync_service.rs:198-220).

At cluster scale this module maps 1:1 onto Delta/Iceberg MERGE INTO; the
API (upsert / conditional_update) is deliberately shaped so the storage
backend can be swapped without touching the pipeline code.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ParquetStateStore:
    """Directory of parquet state tables with copy-on-write replacement.

    CAUTION: ``write(table, ...)`` swaps the table's directory, so any
    *lazy* DataFrame previously derived from ``read(table)`` becomes
    invalid (its file listing points at removed files). Re-read after a
    write, or ``localCheckpoint(eager=True)`` results that must outlive a
    subsequent write. (A transactional table format removes this hazard —
    the MERGE-shaped API maps 1:1 onto Delta/Iceberg.)"""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _recover(self, table: str) -> None:
        """Heal a crash mid-swap. write() swaps via two renames (final ->
        .old-*, then .tmp-* -> final); a crash between them leaves the
        table dir missing but its full previous contents intact under
        .old-*. Restore that dir so a lost swap can never be silently
        read as an empty (reset) table; once a live dir exists, clear
        stale .old-*/.tmp-* siblings (an orphan .tmp-* is an uncommitted
        write and is correctly rolled back)."""
        final = self._path(table)
        base = os.path.basename(final)
        try:
            siblings = os.listdir(self.root)
        except FileNotFoundError:
            return
        olds = sorted(n for n in siblings if n.startswith(f"{base}.old-"))
        tmps = [n for n in siblings if n.startswith(f"{base}.tmp-")]
        if not os.path.exists(final) and olds:
            os.rename(os.path.join(self.root, olds[0]), final)
            olds = olds[1:]
        if os.path.exists(final):
            for n in olds + tmps:
                shutil.rmtree(os.path.join(self.root, n), ignore_errors=True)

    def exists(self, table: str) -> bool:
        self._recover(table)
        return os.path.exists(self._path(table))

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        self._recover(table)
        path = self._path(table)
        if not os.path.exists(path):
            # genuinely never created (recovery found no displaced dir)
            if schema is None:
                raise FileNotFoundError(path)
            return self.spark.createDataFrame([], schema=schema)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(path)

    def write(self, table: str, df: DataFrame, keys: list[str] | None = None) -> None:
        """Atomic replace: write to a temp dir, swap directories. The swap
        window between the two renames is healed by _recover().

        ``keys`` is accepted (and ignored) for call-shape parity with
        BucketedParquetStateStore.write, where it declares the bucket-key
        columns — so a pipeline can swap stores without touching call
        sites."""
        self._recover(table)
        final = self._path(table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{final}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def upsert(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        schema: T.StructType | None = None,
    ) -> None:
        """MERGE: matched -> replace with update row, not matched -> insert
        (the reference's INSERT ... ON CONFLICT DO UPDATE, S7)."""
        existing = self.read(table, schema)
        updates = updates.select(*existing.columns)
        merged = _merge_latest(existing, updates, keys)
        self.write(table, merged)


def _merge_latest(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Union with precedence to update rows (per key, the update wins)."""
    tagged = existing.withColumn("_prio", F.lit(0)).unionByName(
        updates.withColumn("_prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_prio"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def now_ts() -> float:
    return time.time()
