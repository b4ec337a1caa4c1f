"""Temporal join operators Spark lacks natively: as-of join and range
(interval) join, both formulated for 100 TB scale.

As-of join — the union + sort + carry-forward formulation: tag both
sides, sort (key, ts, side) inside one hash partitioning of the key, and
carry the latest right payload forward with ``last(ignorenulls)`` over a
rows-window. ONE shuffle on the key, zero pair blow-up — the naive
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + row_number formulation
materializes O(|matches|) intermediate pairs (quadratic per hot key)
before discarding all but one; this never materializes any pair.

Range join — interval containment via time-binning: each interval is
exploded onto the fixed-width bins it covers, each point falls in exactly
one bin, and the pair space is explored only through the (key, bin)
equi-join, then filtered exactly. Each (point, interval) pair can meet in
at most one bin (the point's), so no dedup pass is needed. Bin width
trades explode factor against bucket co-occupancy — size it near the
median interval width. The naive formulation is a broadcast-nested-loop
join (Spark's only native plan for pure inequality conditions) and dies
at scale; the binned plan is a plain shuffled equi-join AQE can handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the payload of the latest
    right row with ``right_ts <= left_ts`` for the same key (NULLs when no
    such row — left-join semantics, matching DuckDB's ASOF LEFT JOIN).

    Right rows should be unique per (key, right_ts); with duplicates, which
    payload wins is unspecified (dedupe upstream for determinism).
    """
    rv = right_value_cols or [c for c in right.columns if c not in (key, right_ts)]
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c) for c in rv]).alias("_rpayload"),
    )
    l_tagged = left.select(
        "*",
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r_tagged.schema["_rpayload"].dataType).alias("_rpayload"),
    )
    # at equal ts the right row must precede the left row (inclusive <=)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged, allowMissingColumns=True).withColumn(
        "_match", F.last("_rpayload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_right") == 0).drop(
        "_k", "_ts", "_is_right", "_rpayload"
    )
    for c in rv:
        out = out.withColumn(c, F.col("_match")[c])
    return out.drop("_match")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner range join: (point, interval) pairs with
    ``start_col <= point_ts <= end_col`` and equal ``key``, via the
    bin-explode equi-join (see module docstring). Returns all columns of
    both inputs (point columns first)."""
    p_bin = (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    i_lo = (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long")
    i_hi = (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long")
    p = points.withColumn("_bin", p_bin).withColumnRenamed(key, "_pk")
    i = (
        intervals.withColumn("_bin", F.explode(F.sequence(i_lo, i_hi)))
        .withColumnRenamed(key, "_ik")
    )
    joined = p.join(
        i,
        (F.col("_pk") == F.col("_ik")) & (p["_bin"] == i["_bin"]),
        "inner",
    ).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bin").withColumnRenamed("_pk", key).drop("_ik")
