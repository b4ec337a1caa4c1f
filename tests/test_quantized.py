"""int8 fixed-point quantization: determinism and ranking quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.operators import similarity as S
from worker_spark.sources import load_table


def test_quantize_is_clamped_integer_code(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 10.0, -10.0, 0.0])], "vec_id: bigint, embedding: array<float>"
    )
    [row] = df.select(S.quantize_vec(F.col("embedding")).alias("q")).collect()
    assert row["q"] == [32, -32, 127, -128, 0]


def test_quantized_topk_recall_vs_exact(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {(r["q_id"], r["c_id"]) for r in S.cosine_neighbors(qs, emb, top_k=10).collect()}
    quant = {(r["q_id"], r["c_id"]) for r in S.quantized_topk(qs, emb, k=10).collect()}
    assert len(quant) == len(exact)
    # 6-bit fixed point keeps ranking quality: measured 0.88 at sf0.01
    assert len(exact & quant) / len(exact) >= 0.7


def test_pii_redact_counts_and_replacement(spark):
    from worker_spark.operators.text import pii_redact

    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org, ip 192.168.0.1, call 12-345-678-9012"),
        (2, "no pii here, just 1.2 and v1.2.3 and 12-34"),
        (3, "double 10.0.0.1 10.0.0.2"),
    ]
    df = spark.createDataFrame(rows, "id: bigint, text: string")
    got = {r["id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (2, 1, 1)
    assert got[1]["redacted"] == "mail [EMAIL] and [EMAIL], ip [IP], call [PHONE]"
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[2]["redacted"] == rows[1][1]
    assert got[3]["redacted"] == "double [IP] [IP]"


def test_pq_refine_recall_vs_exact_l2(spark):
    from pyspark.sql import Window

    emb = load_table(spark, SF_ORACLE, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d"), F.asc("c_id"))
    exact = {
        (r["q_id"], r["c_id"])
        for r in c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.round(l2, 6).alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 10")
        .collect()
    }
    refined = {
        (r["q_id"], r["c_id"])
        for r in S.pq_adc_refined_topk(emb, k=10, shortlist=100).collect()
    }
    # measured 0.86 at sf0.01 exactly scoring only the 100-candidate (20%)
    # shortlist per query — 0.98 needs shortlist=200 (see ANN_EVAL.md);
    # pin a floor well above the pure-ADC 0.38
    assert len(exact & refined) / len(exact) >= 0.85


def test_char_entropy_known_values(spark):
    from worker_spark.operators.text import with_char_entropy

    rows = [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r["char_entropy"] for r in with_char_entropy(df).collect()}
    assert got[1] == 0.0      # one symbol -> zero bits
    assert got[2] == 1.0      # two equiprobable symbols -> 1 bit
    assert got[3] == 2.0      # four equiprobable symbols -> 2 bits
    assert 4 not in got       # empty docs have no entropy row


def test_opq_groups_partition_dims_and_balance_variance(spark):
    from worker_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        opq_dim_groups,
    )
    from worker_spark.sources import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    groups = opq_dim_groups(emb)
    assert len(groups) == PQ_M
    flat = [d for g in groups for d in g]
    assert sorted(flat) == list(range(1, PQ_M * PQ_SUBDIM + 1))
    assert all(len(g) == PQ_SUBDIM for g in groups)
    assert all(g == sorted(g) for g in groups)


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    from pyspark.sql import functions as F

    from worker_spark.operators.similarity import semantic_dedup

    base = [float(i % 7) + 1.0 for i in range(8)]
    other = [float((i * 3) % 5) - 2.0 for i in range(8)]
    rows = [
        (0, base),          # medoid (id % 4 == 0), also lowest id
        (1, base),          # exact copy -> dropped, dup_of 0
        (2, other),         # different direction -> kept
        (3, [x * 2.0 for x in base]),  # same direction scaled -> dropped
        (4, other),         # medoid for its own cell
        (5, [x * 0.5 for x in other]),  # dropped, dup_of in {2, 4}
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id: bigint, embedding: array<float>"
    )
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(df, centroid_every=4, tau=0.95).collect()
    }
    assert len(got) == 6  # one verdict row per vector
    assert got[0]["kept"] and got[0]["dup_of"] is None
    assert not got[1]["kept"] and got[1]["dup_of"] == 0
    assert not got[3]["kept"] and got[3]["dup_of"] == 0
    assert got[2]["kept"]
    assert not got[5]["kept"] and got[5]["dup_of"] == 2
    # canonical keep-lowest-id: every dropped vector points below itself
    assert all(
        r["dup_of"] < vid for vid, r in got.items() if not r["kept"]
    )


def test_semantic_dedup_fails_loud_without_medoids(spark):
    import pytest

    from worker_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [(i + 1, [float(i), 1.0]) for i in range(5)],
        schema="vec_id: bigint, embedding: array<float>",
    )
    with pytest.raises(ValueError, match="no medoid centroids"):
        semantic_dedup(vecs, centroid_every=100)


def test_ivfpq_auto_stride_matches_pinned_in_floor_regime(spark):
    """The coarse-quantizer knob's "auto" default (r6 — the K ~ sqrt(N)
    IVF rule via similarity.auto_centroid_stride) must resolve to the
    min-stride floor at this corpus size and therefore produce the
    EXACT same result as the registered queries' pinned stride 100;
    plus the derivation math on both sides of the crossover."""
    # derivation: floored below N = min_stride^2, sqrt beyond
    assert S.auto_centroid_stride(500) == S.AUTO_MIN_STRIDE
    assert S.auto_centroid_stride(10_000) == S.AUTO_MIN_STRIDE
    assert S.auto_centroid_stride(1_000_000) == 1000
    assert S.auto_centroid_stride(10**8) == 10_000
    # graph variant balances its multi-assignment factor
    from worker_spark.operators.graph_ann import auto_centroid_every

    assert auto_centroid_every(2_000_000, 2) == 1000
    # end-to-end: auto == pinned at sf0.01 (N=500 -> floor regime)
    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "embedding"
    )
    auto = S.ivfpq_residual_topk(emb, k=5)  # default centroid_every="auto"
    pinned = S.ivfpq_residual_topk(emb, k=5, centroid_every=100)
    a = sorted(tuple(r) for r in auto.collect())
    p = sorted(tuple(r) for r in pinned.collect())
    assert a == p
    # the other two auto sites agree with their pinned registered
    # settings in the floor regime too
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    ia = sorted(
        tuple(r) for r in S.ivf_ann_neighbors(queries, emb).collect()
    )
    ip = sorted(
        tuple(r)
        for r in S.ivf_ann_neighbors(queries, emb, centroid_every=100).collect()
    )
    assert ia == ip
    sa = sorted(tuple(r) for r in S.semantic_dedup(emb).collect())
    sp = sorted(
        tuple(r)
        for r in S.semantic_dedup(
            emb, centroid_every=S.SEMDEDUP_CENTROID_EVERY
        ).collect()
    )
    assert sa == sp
    # codebook budget knob (PQ family): floored below N = 256*50, capped
    # at 256 codewords beyond — and auto == pinned at this corpus size
    assert S.auto_codebook_stride(500) == 50
    assert S.auto_codebook_stride(12_800) == 50
    assert S.auto_codebook_stride(1_000_000) == 3907
    assert 1_000_000 // S.auto_codebook_stride(1_000_000) <= 256
    ca = sorted(tuple(r) for r in S.pq_adc_topk(emb, k=5).collect())
    cp = sorted(
        tuple(r)
        for r in S.pq_adc_topk(emb, k=5, codebook_stride=50).collect()
    )
    assert ca == cp
