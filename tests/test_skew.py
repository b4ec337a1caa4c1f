"""Salted-join correctness: identical result to a plain join, salt spread
actually partitions the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.skew import join_skew_profile, salted_join, with_salt


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + long tail
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 102)],
        schema="key: bigint, v: bigint",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 102)], schema="key: bigint, name: string"
    )
    plain = {(r["key"], r["v"], r["name"]) for r in fact.join(dim, "key").collect()}
    salted = {
        (r["key"], r["v"], r["name"])
        for r in salted_join(fact, dim, "key", n_salts=8, entropy_col="v").collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], schema="key: bigint, v: bigint")
    n = with_salt(fact, 8, entropy_col="v").select("_salt").distinct().count()
    assert n == 8  # the hot key's rows land in all salt partitions


def test_short_document_shingles_empty(spark):
    """Documents shorter than the shingle width produce NO shingles
    (regression: Spark's sequence(0, negative) descends)."""
    from worker_spark.operators.dedup import word_shingles

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one"), (3, ""), (4, "a b c")],
        schema="doc_id: bigint, text: string",
    )
    got = {r["id"]: r["shingle"] for r in word_shingles(docs, n=3).collect()}
    assert got == {4: "a b c"}


def test_stop_shingle_df_cap_bounds_candidates(spark):
    """A shingle shared by every document must NOT drive O(n^2) pair fan-out:
    with the df cap on, the hot shingle is dropped pre-join, pairs come only
    from sub-cap shingles, and jaccard is exact over the capped universe."""
    from worker_spark.operators.dedup import ngram_jaccard_pairs

    common = "felles frasen her"  # one 3-gram present in EVERY document
    docs = spark.createDataFrame(
        # 60 docs sharing only the hot shingle + 2 true near-dups
        [(i, f"{common} unik{i} tekst{i} nr{i}") for i in range(60)]
        + [(100, f"{common} delt tekst her og der"), (101, f"{common} delt tekst her og nu")],
        schema="doc_id: bigint, text: string",
    )

    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, shingle_df_cap=None)
    # every pair shares the hot shingle -> full 62*61/2 pair blow-up
    assert uncapped.count() == 62 * 61 // 2

    capped = ngram_jaccard_pairs(docs, threshold=0.0, shingle_df_cap=10).cache()
    rows = capped.collect()
    # only the true near-dup pair survives: candidate count is bounded by
    # sub-cap shingle co-occurrence, not corpus size
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(100, 101)}
    (pair,) = rows
    # jaccard exact over the capped universe: 6 shingles per doc, the hot
    # one dropped -> 5 each, 4 shared -> 4/(5+5-4)
    assert pair["n_inter"] == 4
    assert pair["jaccard"] == round(4 / 6, 6)
    spark.catalog.clearCache()


def test_multitable_lsh_recall_beats_single_table(spark):
    """ANN quality metric: recall@10 of multi-table LSH vs the single-
    signature baseline, against brute-force ground truth at sf0.001."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from worker_spark.operators.similarity import (
        cosine_neighbors,
        lsh_ann_neighbors,
        multitable_lsh_ann_neighbors,
    )
    from worker_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)

    def topk(df, k=10):
        w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
        return df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)

    truth = {
        (r["q_id"], r["c_id"])
        for r in topk(cosine_neighbors(queries, emb, threshold=-2.0)).collect()
    }
    single = {
        (r["q_id"], r["c_id"])
        for r in topk(lsh_ann_neighbors(queries, emb, threshold=-2.0)).collect()
    }
    multi = {
        (r["q_id"], r["c_id"])
        for r in topk(
            multitable_lsh_ann_neighbors(queries, emb, n_tables=8, planes_per_table=6)
        ).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    # multi-table must dominate the single 12-bit signature on recall
    assert recall_multi > recall_single
    assert recall_multi >= 0.2, f"recall@10 too low: {recall_multi:.3f}"


def test_matrix_scorer_matches_hof_scorer(spark):
    """The numpy/Arrow matrix top-k must produce exactly the same neighbor
    sets as the JVM higher-order-function formulation."""
    from pyspark.sql import functions as F

    from worker_spark.operators.similarity import cosine_topk_matrix
    from worker_spark.queries import all_queries
    from worker_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    hof = {
        (r["q_id"], r["c_id"], r["rnk"])
        for r in all_queries()["similarity_cosine_topk"].run(spark, sf).collect()
    }
    mat = {
        (r["q_id"], r["c_id"], r["rnk"])
        for r in cosine_topk_matrix(queries, emb, k=5).collect()
    }
    assert mat == hof


def test_matrix_scorer_edge_cases(spark):
    """Empty query set and zero-norm vectors: empty result / dropped pairs,
    matching the HOF scorer's try_divide semantics."""
    from worker_spark.operators.similarity import cosine_topk_matrix

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 1.0])],
        "vec_id: bigint, embedding: array<float>",
    )
    empty_q = emb.filter("vec_id < 0")
    assert cosine_topk_matrix(empty_q, emb, k=3).count() == 0

    out = cosine_topk_matrix(emb, emb, k=3).collect()
    pairs = {(r["q_id"], r["c_id"]) for r in out}
    # zero-norm vector 2 never appears on either side of a scored pair
    assert all(2 not in p for p in pairs)
    assert (1, 3) in pairs and (3, 1) in pairs


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's skew-join handling is the runtime half of the skew story
    (salting is the static half): a hot key's shuffle partition must be
    split into multiple reader tasks, visible as skew=true in the final
    adaptive plan."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # low thresholds: shuffle partitions are lz4-compressed, so the
        # hot partition is only ~100s of KB on disk at this row count
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # key 0 carries ~100x the payload of every other key
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id") % 37).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 2_000).select(
            (F.col("id") % 37).alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k").select("k")
        # the action must run THROUGH this DataFrame's own QueryExecution:
        # count()/write() build a different one and leave this plan unfinal
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k long, payload string")


def test_join_skew_profile_exact_size_and_hot_key(spark):
    # left: key 1 x 6 rows, key 2 x 2, key 3 x 1 (+ a NULL that must not
    # count); right: key 1 x 4, key 2 x 1, key 9 x 5 (no match)
    left = _kv(
        spark,
        [(1, "a")] * 6 + [(2, "a")] * 2 + [(3, "a")] + [(None, "a")],
    )
    right = _kv(spark, [(1, "b")] * 4 + [(2, "b")] + [(9, "b")] * 5)
    prof = join_skew_profile(
        left, right, "k", top_n=2, broadcast_rows=0, salt_share=0.5
    ).collect()
    # est_join_rows must equal the real inner-join row count
    true_size = left.join(right, "k").count()
    assert prof[0]["est_join_rows"] == true_size == 6 * 4 + 2 * 1
    assert [r["key"] for r in prof] == [1, 2]  # top-2 by contribution
    assert (prof[0]["n_left"], prof[0]["n_right"]) == (6, 4)
    assert prof[0]["rank"] == 1 and prof[1]["rank"] == 2
    # key 1 owns 24/26 of the output -> salting verdict (broadcast off)
    assert prof[0]["strategy"] == "salt_hot_keys"
    assert abs(prof[0]["max_share"] - 24 / 26) < 1e-6
    assert prof[0]["left_rows"] == 9  # NULL key excluded
    assert (prof[0]["left_keys"], prof[0]["right_keys"]) == (3, 3)
    assert prof[0]["match_keys"] == 2


def test_join_skew_profile_strategy_branches(spark):
    left = _kv(spark, [(i, "a") for i in range(20)])
    right = _kv(spark, [(i % 5, "b") for i in range(10)])
    # right (10 rows) under the broadcast threshold
    assert (
        join_skew_profile(left, right, "k", broadcast_rows=10)
        .first()["strategy"]
        == "broadcast_right"
    )
    # right over, left (20 rows) under a 25-row threshold... order matters:
    # right is checked first, so raise right above and left below
    assert (
        join_skew_profile(
            _kv(spark, [(0, "a")] * 5), right, "k", broadcast_rows=9
        ).first()["strategy"]
        == "broadcast_left"
    )
    # both sides over the threshold, no hot key -> shuffle
    assert (
        join_skew_profile(
            left, right, "k", broadcast_rows=0, salt_share=0.9
        ).first()["strategy"]
        == "shuffle_join"
    )


def test_join_skew_profile_plan_is_take_ordered(spark):
    # the top-N must come from sort+limit (TakeOrdered), never a global
    # row_number over the full key table; the only Window in the plan
    # ranks the already-limited top_n rows
    left = _kv(spark, [(i % 7, "a") for i in range(100)])
    right = _kv(spark, [(i % 7, "b") for i in range(100)])
    plan = (
        join_skew_profile(left, right, "k", top_n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
