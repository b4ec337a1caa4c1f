"""Z-order clustering: Morton-key correctness, layout-stats invariants,
and the physical write-path claim (range-partitioning on the z key
bounds BOTH columns' per-partition spans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.zorder import (
    morton_key,
    zorder_layout_stats,
    zorder_repartition,
)


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b11, 0b01), (0b10, 0b10), (0, 0), (0b11, 0b11)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            morton_key(F.col("a"), F.col("b"), bits=2).alias("z")
        ).collect()
    ]
    # a bits land at odd positions, b bits at even:
    # (3,1)->0b1011=11; (2,2)->0b1100=12; (0,0)->0; (3,3)->0b1111=15
    assert got == [11, 12, 0, 15]


def _grid(spark, n=64):
    # n x n grid of (x, y): the worst case for a single-column layout
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )


def test_layout_stats_zorder_bounds_both_columns(spark):
    stats = {
        (r["layout"], r["column"]): r
        for r in zorder_layout_stats(
            _grid(spark), "x", "y", buckets=16
        ).collect()
    }
    lin_x = stats[("linear_x", "x")]
    lin_y = stats[("linear_x", "y")]
    z_x = stats[("zorder", "x")]
    z_y = stats[("zorder", "y")]
    # linear layout: x clustered tightly, y full-range in every bucket
    assert lin_x["avg_span"] < 0.1 and lin_x["prune_frac"] > 0.9
    assert lin_y["avg_span"] > 0.9 and lin_y["prune_frac"] == 0.0
    # z-order: BOTH columns bounded (16 buckets in 2D -> span ~ 1/4)
    for r in (z_x, z_y):
        assert r["avg_span"] < 0.5
        assert r["prune_frac"] > 0.5
    # the layout decision metric: the WORST column improves massively
    assert (
        max(z_x["avg_span"], z_y["avg_span"])
        < max(lin_x["avg_span"], lin_y["avg_span"]) / 2
    )


def test_layout_stats_excludes_null_rows(spark):
    df = _grid(spark, n=8).unionByName(
        spark.createDataFrame([(None, 1), (2, None)], "x long, y long")
    )
    stats = zorder_layout_stats(df, "x", "y", buckets=4).collect()
    # 8x8 grid only: bucket stats must be identical to the null-free run
    clean = zorder_layout_stats(_grid(spark, n=8), "x", "y", buckets=4)
    assert sorted(map(tuple, stats)) == sorted(map(tuple, clean.collect()))


def test_zorder_repartition_bounds_physical_partition_spans(spark):
    df = _grid(spark, n=32)
    parts = 8

    def spans(frame):
        per = (
            frame.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
            .collect()[0]
        )
        return per["ax"], per["ay"]

    lin_x, lin_y = spans(df.repartitionByRange(parts, "x"))
    z_x, z_y = spans(zorder_repartition(df, "x", "y", num_partitions=parts))
    # linear: y unbounded (~31) in every partition; z-order: both bounded
    assert lin_y > 25
    assert max(z_x, z_y) < lin_y / 2
    # schema is restored (no helper columns leak into the written table)
    assert set(
        zorder_repartition(df, "x", "y", num_partitions=parts).columns
    ) == {"x", "y"}
