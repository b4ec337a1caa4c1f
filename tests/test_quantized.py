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
