"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production target is a
multi-executor cluster over ~100 TB. Every setting here is chosen to be
correct at both scales:

* AQE on — runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts at large scale.
* shuffle.partitions sized to cores locally; on a cluster AQE's coalescing
  makes the initial number mostly irrelevant (set high, let AQE shrink).
* Arrow enabled — every pandas_udf / applyInPandas boundary is Arrow-batched.
* UTC session timezone — parity with the DuckDB oracle and the reference's
  TIMESTAMPTZ columns.
* ANSI mode left at the engine default; all engine code is written
  ANSI-safe (try_* functions, explicit casts) so it runs under either.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "worker_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size-based coalescing, not parallelism-based: with parallelismFirst
        # (the default) AQE refuses to coalesce below the core count, so deep
        # multi-stage plans over small-to-medium shuffles keep N-core's worth
        # of tiny tasks per stage and pay ~10x scheduling overhead (measured
        # 35s -> 5s on the MinHash pipeline at sf0.1). At cluster scale
        # size-based is also what you want.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
