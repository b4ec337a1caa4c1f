"""Table profiling: per-column statistics in one pass.

The ANALYZE surface: row count, null count, exact distinct count, and
min/max (as 32-char string prefixes, engine-neutral for hashing) for
each requested column. One aggregation pass computes every statistic
(Spark evaluates the expressions in a single whole-stage-codegen
aggregate; countDistinct columns each add a partial-distinct expand,
still one shuffle round), then the wide row is unpivoted to one row per
column. Profiles drive planner decisions (broadcast thresholds, skew
detection) and data-quality gates at ingest; at 100 TB the cost is the
one scan you were going to do anyway.

No reference counterpart file — engine-infrastructure extension
(SURVEY.md §2 A-family exposes exact counts; this is the systematic
per-column version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_PREFIX = 32


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_prefix, max_prefix)."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        col = F.col(c)
        aggs.extend(
            [
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_nulls_{c}"),
                F.countDistinct(col).alias(f"_nd_{c}"),
                F.substring(F.min(col).cast("string"), 1, PROFILE_PREFIX)
                .alias(f"_min_{c}"),
                F.substring(F.max(col).cast("string"), 1, PROFILE_PREFIX)
                .alias(f"_max_{c}"),
            ]
        )
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_prefix"),
                F.col(f"_max_{c}").alias("max_prefix"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
