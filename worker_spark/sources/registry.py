"""Parquet table registry for the driver testdata (TESTDATA.md).

Mirrors the reference's Postgres reads (S6, /root/reference/src/storage.rs:416-441,
788-915): a scan there is a keyed/streamed SELECT; here it is a parquet scan that
Catalyst prunes (column pruning + predicate pushdown reach the file reader —
verified in tests via .explain containing PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def tune_session(spark: SparkSession) -> None:
    """Runtime-settable perf confs applied to whatever session the driver
    hands us: size-based AQE coalescing (parallelismFirst keeps core-count
    tiny tasks per stage and costs ~10x scheduling overhead on deep plans
    over small shuffles — see worker_spark.session)."""
    try:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    except Exception:  # pragma: no cover - conf may be restricted
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
        # rejects; read it as raw nanos and convert to a micros timestamp
        # (exact: the driver generator emits whole-microsecond values).
        # The legacy conf is scoped to this read and restored — leaving it
        # set would silently turn every later nanos-timestamp parquet read
        # on the shared session into bigint columns. (The plan built here
        # stays valid: the conf is captured at analysis time.)
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prior: str | None = spark.conf.get(conf_key)
        except Exception:
            prior = None
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(path)
            from pyspark.sql import functions as F

            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the testdata tables as temp views so pipelines can use the
    SQL API interchangeably with the DataFrame API (Catalyst produces the
    same plan either way)."""
    for n in names or TPCH_TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
