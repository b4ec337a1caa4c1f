"""Sketch operators: HLL accuracy + mergeability, KMV exact-below-k,
Count-Min never-underestimate guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    KMV_K,
    cms_cells,
    cms_heavy_hitters,
    hll_distinct,
    hll_registers,
    kmv_distinct,
)


def _ids(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.col("id").alias("val")
    )


def test_hll_estimate_within_expected_error(spark):
    # m=64 -> standard error 1.04/sqrt(64) = 13%; allow 3 sigma
    got = hll_distinct(_ids(spark, 5000), "val", "grp").collect()[0]
    assert got["exact_distinct"] == 5000
    assert abs(got["hll_estimate"] - 5000) / 5000 < 0.4
    assert got["rel_error"] < 0.4


def test_hll_registers_merge_with_max(spark):
    # sketch(union) == max-merge(sketch(a), sketch(b)): the property that
    # makes HLL partial aggregation correct across partitions
    a, b = _ids(spark, 3000), spark.range(2000, 6000).select(
        F.lit("g").alias("grp"), F.col("id").alias("val")
    )
    ra = hll_registers(a, "val", "grp")
    rb = hll_registers(b, "val", "grp")
    merged = (
        ra.unionAll(rb)
        .groupBy("grp", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(a.unionAll(b), "val", "grp")
    diff = (
        merged.join(whole, ["grp", "bucket"], "full")
        .filter(merged["max_rho"] != whole["max_rho"])
        .count()
    )
    assert diff == 0
    assert whole.count() == HLL_M


def test_kmv_exact_below_k_and_estimates_above(spark):
    small = _ids(spark, KMV_K - 4)
    got = kmv_distinct(small, "val", "grp").collect()[0]
    assert got["kmv_estimate"] == float(KMV_K - 4)
    assert got["rel_error"] == 0.0

    big = _ids(spark, 20000)
    got = kmv_distinct(big, "val", "grp").collect()[0]
    assert got["exact_distinct"] == 20000
    # k=16 -> standard error ~1/sqrt(k-2) ~ 27%; allow wide
    assert abs(got["kmv_estimate"] - 20000) / 20000 < 0.8


def test_cms_never_underestimates_and_grid_is_bounded(spark):
    rows = [("apple",)] * 50 + [("pear",)] * 30 + [("plum",)] * 7
    toks = spark.createDataFrame(rows, schema="token: string")
    hh = {r["token"]: r for r in cms_heavy_hitters(toks, "token").collect()}
    assert hh["apple"]["true_count"] == 50
    for r in hh.values():
        assert r["cms_estimate"] >= r["true_count"]
        assert r["overestimate"] == r["cms_estimate"] - r["true_count"]
    assert cms_cells(toks, "token").count() <= CMS_DEPTH * CMS_WIDTH


def test_bloom_no_false_negatives_and_mergeable_shape(spark):
    from worker_spark.operators.sketches import (
        BLOOM_WORDS,
        bloom_build,
        bloom_probe,
    )

    corpus = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(300)], schema="id: bigint, k: string"
    )
    bloom = bloom_build(corpus, "k")
    rows = bloom.collect()
    assert len(rows) <= BLOOM_WORDS  # sparse word rows, bounded
    assert all(r["bits"] > 0 for r in rows)

    probes = spark.createDataFrame(
        [(f"m{i}", "member", f"key-{i}") for i in range(0, 300, 7)]
        + [(f"a{i}", "absent", f"nope-{i}") for i in range(50)],
        schema="probe_id: string, kind: string, k: string",
    )
    got = {
        r["probe_id"]: r["maybe_member"]
        for r in bloom_probe(probes, bloom, "k", ["probe_id", "kind"]).collect()
    }
    # THE bloom invariant: a member can never probe false
    assert all(got[f"m{i}"] for i in range(0, 300, 7))
    # absent probes are mostly false (false positives allowed, bounded)
    fp = sum(1 for i in range(50) if got[f"a{i}"])
    assert fp < 15


def test_bloom_merge_is_bitwise_or(spark):
    """Two half-corpus filters OR-merged equal the full-corpus filter —
    the property that makes the sketch usable incrementally."""
    from pyspark.sql import functions as F

    from worker_spark.operators.sketches import bloom_build

    half_a = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(0, 150)], schema="id: bigint, k: string"
    )
    half_b = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(150, 300)],
        schema="id: bigint, k: string",
    )
    full = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(300)], schema="id: bigint, k: string"
    )
    merged = {
        r["word"]: r["bits"]
        for r in bloom_build(half_a, "k")
        .unionByName(bloom_build(half_b, "k"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    direct = {r["word"]: r["bits"] for r in bloom_build(full, "k").collect()}
    assert merged == direct


def test_kmv_ignores_nulls_and_omits_all_null_groups(spark):
    from worker_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g1", None), ("g1", None), ("g2", "x"), ("g2", None)],
        schema="grp: string, val: string",
    )
    rows = {r["grp"]: r for r in kmv_distinct(df, "val", "grp").collect()}
    assert "g1" not in rows  # all-NULL group omitted (no crash)
    assert rows["g2"]["exact_distinct"] == 1


def test_bloom_rejects_grouped_filter_and_drops_null_keys(spark):
    import pytest

    from pyspark.sql import functions as F

    from worker_spark.operators.sketches import bloom_build, bloom_probe

    df = spark.createDataFrame(
        [("t1", "a"), ("t1", None), ("t2", "b")],
        schema="tenant: string, k: string",
    )
    grouped = bloom_build(df, "k", "tenant")
    probes = df.select(F.col("k").alias("pid"), "k")
    with pytest.raises(ValueError, match="ungrouped"):
        bloom_probe(probes, grouped, "k", ["pid"])
    # NULL keys dropped on both sides: build doesn't crash, NULL probe absent
    flat = bloom_build(df, "k")
    got = bloom_probe(probes, flat, "k", ["pid"]).collect()
    assert sorted(r["pid"] for r in got) == ["a", "b"]
    assert all(r["maybe_member"] for r in got)
