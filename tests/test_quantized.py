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
