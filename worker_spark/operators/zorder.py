"""Z-order (Morton) clustering for multi-column data skipping.

At 100 TB, file-level min/max pruning is the first line of defense: a
parquet scan skips every file whose [min, max] statistics exclude the
predicate. But a layout sorted by ONE column gives the OTHER columns
full-range statistics in every file — a `user_id`-sorted events table
prunes nothing for a timestamp predicate. Z-ordering interleaves the
bits of two (or more) normalized columns into a single Morton key;
range-partitioning on that key yields files whose min/max spans are
bounded in EVERY interleaved dimension (~B^(-1/d) of the range for B
files in d dimensions), so either predicate skips most files. This is
the clustering idea behind Delta/Iceberg OPTIMIZE ZORDER, re-expressed
as plain column arithmetic + repartitionByRange (no table format
needed; reference has no counterpart — the reference's Postgres B-tree
covers one dimension, src/storage.rs index DDL).

The arithmetic is engine-exact (long multiplies, one double division
per normalize — exact below the 2^53 bound documented on
normalize_to_bits — and shift/or interleaving), so the key — and the
layout-statistics audit below — is bit-identical in DuckDB and
oracle-checkable.

* ``morton_key(a, b, bits)`` — interleaved key column (JVM-side
  shift/mask expression tree, map-only).
* ``zorder_repartition(df, c1, c2)`` — the layout operator: compute the
  key from per-column global min/max (one tiny agg, broadcast back),
  then repartitionByRange + sortWithinPartitions. Writing the result
  gives z-clustered files.
* ``zorder_layout_stats(df, c1, c2)`` — the audit surface: bucket rows
  by equal-width slices of (a) the linear c1 order and (b) the z-order
  key, and report per-bucket normalized span and point-probe prune
  fraction for BOTH columns under BOTH layouts. Map-only + one bounded
  groupBy (B buckets x 2 layouts), so the audit itself scales; the
  equal-width bucketing stands in for the range partitioner
  deterministically (real repartitionByRange samples split points,
  which an oracle cannot replay)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits per dimension; key fits in 2*Z_BITS = 32 bits
Z_BUCKETS = 64  # audit bucket count (stand-in for output file count)


def normalize_to_bits(
    col: Column, lo: Column, hi: Column, bits: int = Z_BITS
) -> Column:
    """Map ``col`` in [lo, hi] to an integer in [0, 2^bits):
    ((x - lo) * (2^bits - 1)) / max(hi - lo, 1), floored. The multiply
    is exact long arithmetic and the division is double, so the result
    is exact (and engine-identical) as long as (hi - lo) * (2^bits - 1)
    stays below 2^53 — i.e. column span below ~2^37 at the default 16
    bits. Epoch SECONDS over decades fits; epoch MICROS over more than
    a few hours does not — rescale such columns first (the registered
    query uses unix_timestamp seconds). Constant columns map to 0."""
    top = F.lit((1 << bits) - 1).cast("long")
    span = F.greatest(hi.cast("long") - lo.cast("long"), F.lit(1))
    return ((col.cast("long") - lo.cast("long")) * top / span).cast("long")


def morton_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two normalized columns:
    bit j of ``a`` lands at position 2j+1, bit j of ``b`` at 2j (the
    textbook Morton code). Pure shift/mask expression — map-only."""
    key = F.lit(0).cast("long")
    for j in range(bits):
        abit = F.shiftright(a, j).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, j).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(abit, 2 * j + 1) + F.shiftleft(bbit, 2 * j)
    return key


def _with_norms(
    df: DataFrame, c1: str, c2: str, bits: int
) -> DataFrame:
    """Attach normalized columns + the z key; global min/max come from
    one tiny aggregate broadcast back onto the rows."""
    bounds = df.agg(
        F.min(c1).cast("long").alias("_lo1"),
        F.max(c1).cast("long").alias("_hi1"),
        F.min(c2).cast("long").alias("_lo2"),
        F.max(c2).cast("long").alias("_hi2"),
    )
    x = df.crossJoin(F.broadcast(bounds))
    n1 = normalize_to_bits(F.col(c1), F.col("_lo1"), F.col("_hi1"), bits)
    n2 = normalize_to_bits(F.col(c2), F.col("_lo2"), F.col("_hi2"), bits)
    return x.withColumn("_n1", n1).withColumn("_n2", n2).withColumn(
        "_z", morton_key(F.col("_n1"), F.col("_n2"), bits)
    )


def zorder_repartition(
    df: DataFrame,
    c1: str,
    c2: str,
    num_partitions: int = Z_BUCKETS,
    bits: int = Z_BITS,
) -> DataFrame:
    """The layout operator: rows range-partitioned and sorted by the
    Morton key of (c1, c2). Write the result and every output file's
    min/max statistics are bounded in BOTH columns. NULLs in either
    column sort first (normalized NULL -> NULL key; kept, not dropped —
    a real table's NULL stratum still needs a home)."""
    z = _with_norms(df, c1, c2, bits)
    return (
        z.repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_n1", "_n2", "_z", "_lo1", "_hi1", "_lo2", "_hi2")
    )


def zorder_layout_stats(
    df: DataFrame,
    c1: str,
    c2: str,
    buckets: int = Z_BUCKETS,
    bits: int = Z_BITS,
) -> DataFrame:
    """Layout-quality audit: equal-width bucketings of the linear-c1
    layout vs the z-order layout, with per-column clustering metrics.

    Output (4 rows): layout x column ->
      * n_buckets  — non-empty buckets (files the layout would produce);
      * avg_span   — mean normalized [min, max] width per bucket, the
        expected fraction of the value range a file's stats cover
        (lower = better skipping);
      * prune_frac — fraction of buckets a mid-range POINT predicate on
        this column skips via min/max alone (higher = better).

    The headline at any scale: linear_c1 clusters c1 perfectly and c2
    not at all (avg_span ~1, prune_frac ~0); zorder bounds BOTH near
    B^(-1/2). Rows with a NULL in either column are excluded from the
    audit (they carry no interleavable position)."""
    z = _with_norms(
        df.filter(F.col(c1).isNotNull() & F.col(c2).isNotNull()),
        c1,
        c2,
        bits,
    )
    top = (1 << bits) - 1
    zmax = (1 << (2 * bits)) - 1
    mid = F.lit(top // 2)
    # single pass: tag every row with both layouts' bucket ids via one
    # 2-element explode, aggregate (layout, bucket) once, then derive
    # all four (layout, column) metric rows from the tiny bucket frame
    tagged = z.select(
        "_n1",
        "_n2",
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear_" + c1).alias("layout"),
                    (F.col("_n1") * buckets / F.lit(top + 1))
                    .cast("long")
                    .alias("b"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    (F.col("_z") * buckets / F.lit(zmax + 1))
                    .cast("long")
                    .alias("b"),
                ),
            )
        ).alias("lb"),
    ).select("_n1", "_n2", F.col("lb.layout").alias("layout"), F.col("lb.b").alias("b"))
    per_bucket = tagged.groupBy("layout", "b").agg(
        F.min("_n1").alias("lo1"),
        F.max("_n1").alias("hi1"),
        F.min("_n2").alias("lo2"),
        F.max("_n2").alias("hi2"),
    )
    per_col = per_bucket.select(
        "layout",
        F.explode(
            F.array(
                F.struct(
                    F.lit(c1).alias("column"),
                    F.col("lo1").alias("lo"),
                    F.col("hi1").alias("hi"),
                ),
                F.struct(
                    F.lit(c2).alias("column"),
                    F.col("lo2").alias("lo"),
                    F.col("hi2").alias("hi"),
                ),
            )
        ).alias("cs"),
    ).select(
        "layout",
        F.col("cs.column").alias("column"),
        F.col("cs.lo").alias("lo"),
        F.col("cs.hi").alias("hi"),
    )
    # exact integer sums + ONE division per metric: summing the
    # per-bucket doubles first would expose cross-engine summation-order
    # ulps (the graph_nn_descent_stats gotcha); integer sums are
    # bit-identical and the single division is IEEE-deterministic
    counted = per_col.groupBy("layout", "column").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("hi") - F.col("lo")).alias("_span_sum"),
        F.sum(
            ((mid < F.col("lo")) | (mid > F.col("hi"))).cast("long")
        ).alias("_pruned"),
    )
    # BARE single-op division of exact integers, no round(): round(x, 6)
    # on a division result can land on a half-boundary the engines
    # resolve differently (seen live here: 0.987728 vs 0.987729), while
    # the plain IEEE quotient of identical integers is bit-identical
    return counted.select(
        "layout",
        "column",
        "n_buckets",
        (
            F.col("_span_sum").cast("double")
            / (F.col("n_buckets") * F.lit(top)).cast("double")
        ).alias("avg_span"),
        (
            F.col("_pruned").cast("double")
            / F.col("n_buckets").cast("double")
        ).alias("prune_frac"),
    )
