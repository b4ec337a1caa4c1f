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
    theta_set_ops,
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


def _vals(spark, rows):
    # rows: (grp, key, value)
    return spark.createDataFrame(rows, "grp string, key long, value double")


def test_quantile_sketch_exact_when_group_fits(spark):
    # n <= k keeps every row: nearest-rank order statistics of the FULL
    # group, regardless of partitioning
    from worker_spark.operators.sketches import quantile_sketch

    rows = [("g", i, float(i)) for i in range(1, 101)]  # values 1..100
    got = quantile_sketch(
        _vals(spark, rows).repartition(7), "value", "key", "grp"
    ).collect()[0]
    assert got["m"] == 100
    # nearest-rank: ceil(100*q) -> v_50, v_90, v_99
    assert got["p50_est"] == 50.0
    assert got["p90_est"] == 90.0
    assert got["p99_est"] == 99.0


def test_quantile_sketch_partition_invariant_and_mergeable(spark):
    # the sketch is a pure function of the row multiset: any partitioning
    # (including single-partition, i.e. no merge at all) gives the same
    # sample — which IS the bottom-k merge property
    from worker_spark.operators.sketches import quantile_sketch

    rows = [("a", i, float((i * 37) % 1000)) for i in range(5000)]
    rows += [("b", 10_000 + i, float(i % 97)) for i in range(3000)]
    df = _vals(spark, rows)
    outs = [
        sorted(
            map(
                tuple,
                quantile_sketch(
                    df.repartition(n), "value", "key", "grp"
                ).collect(),
            )
        )
        for n in (1, 5, 32)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_quantile_sketch_audit_rank_error_bound(spark):
    # k=512 uniform sample: rank error concentrates around
    # sqrt(q(1-q)/k) <= 2.2% at q=.5; deterministic given the hash, and
    # this seed realizes well under 3 sigma for every quantile
    from worker_spark.operators.sketches import quantile_sketch_audit

    rows = [("g", i, float((i * 7919) % 100_000)) for i in range(20_000)]
    got = quantile_sketch_audit(
        _vals(spark, rows), "value", "key", "grp"
    ).collect()[0]
    assert got["n"] == 20_000 and got["m"] == 512
    assert got["p50_rank_err"] < 0.07
    assert got["p90_rank_err"] < 0.05
    assert got["p99_rank_err"] < 0.02


def test_quantile_sketch_ignores_null_and_nan(spark):
    from worker_spark.operators.sketches import quantile_sketch

    rows = [("g", 1, 5.0), ("g", 2, None), ("g", 3, float("nan")),
            ("g", 4, 1.0), ("x", 5, None)]
    got = {r["grp"]: r for r in quantile_sketch(
        _vals(spark, rows), "value", "key", "grp"
    ).collect()}
    assert got["g"]["m"] == 2  # NULL and NaN dropped
    assert got["g"]["p99_est"] == 5.0
    assert "x" not in got  # all-NULL group omitted


def test_quantile_sketch_drops_null_keys(spark):
    # md5(NULL) is NULL; a NULL hash would sort FIRST in Spark's struct
    # ordering but LAST under the oracle's ORDER BY (confirmed in review)
    # — and would be deterministically always-sampled. NULL-key rows are
    # excluded on both sides instead.
    from worker_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_audit,
    )

    rows = [("g", None, 999.0)] + [("g", i, float(i)) for i in range(1, 11)]
    got = quantile_sketch(
        _vals(spark, rows), "value", "key", "grp"
    ).collect()[0]
    assert got["m"] == 10  # the NULL-key row is not in the sample
    assert got["p99_est"] == 10.0  # 999.0 never enters
    # audit path agrees, and its n (the audited population) excludes it too
    aud = quantile_sketch_audit(
        _vals(spark, rows), "value", "key", "grp"
    ).collect()[0]
    assert (aud["n"], aud["m"]) == (10, 10)


def _overlap_df(spark):
    # A = {0..99}, B = {50..149} (overlap 50), C = {0..9} subset of A;
    # plus NULL values that must be ignored
    rows = (
        [("A", i) for i in range(100)]
        + [("B", i) for i in range(50, 150)]
        + [("C", i) for i in range(10)]
        + [("A", None), ("C", None)]
    )
    return spark.createDataFrame(rows, "g string, v int")


def test_theta_set_ops_exact_when_underfull(spark):
    # k=1024 > every group size: theta stays at the full hash space,
    # the scale factor is 1, and every estimate degrades to exact
    got = {
        (r["group_a"], r["group_b"]): r
        for r in theta_set_ops(
            _overlap_df(spark), "v", "g", k=1024
        ).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert ab["inter_est"] == ab["exact_inter"] == 50
    assert ab["union_est"] == ab["exact_union"] == 150
    assert ab["diff_ab_est"] == 50.0
    assert abs(ab["jaccard_est"] - 50 / 150) < 1e-6
    assert ab["inter_rel_err"] == 0.0 and ab["union_rel_err"] == 0.0
    ac = got[("A", "C")]
    assert ac["inter_est"] == 10 and ac["union_est"] == 100
    bc = got[("B", "C")]
    assert bc["inter_est"] == 0 and bc["exact_inter"] == 0
    # rel err vs an exact 0 intersection is undefined -> NULL, not inf
    assert bc["inter_rel_err"] is None


def test_theta_set_ops_sampled_estimates_track_exact(spark):
    # k=64 sketches over 100-150 element sets: estimates should land
    # within the theta-sketch error envelope (~1/sqrt(k) per set op)
    for r in theta_set_ops(_overlap_df(spark), "v", "g", k=64).collect():
        if r["exact_inter"] > 0:
            assert (
                abs(r["inter_est"] - r["exact_inter"]) / r["exact_inter"]
                < 0.75
            )
        assert (
            abs(r["union_est"] - r["exact_union"]) / r["exact_union"] < 0.5
        )


def test_theta_set_ops_audit_false_is_estimate_only(spark):
    df = theta_set_ops(_overlap_df(spark), "v", "g", k=8, audit=False)
    assert df.columns == [
        "group_a",
        "group_b",
        "inter_est",
        "union_est",
        "diff_ab_est",
        "jaccard_est",
    ]
    assert df.count() == 3
