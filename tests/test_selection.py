"""DSIR importance-weighted selection: target enrichment + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.selection import importance_weights, select_top_k


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id: bigint, text: string, lang: string"
    )


def test_importance_weights_prefer_target_like_text(spark):
    # target docs are vowel-heavy; distractors are consonant-heavy; the
    # held-out vowel-heavy raw doc must outscore the consonant ones
    rows = (
        [(i, "aeiou aeea ouie aeio", "t") for i in range(10)]
        + [(100, "aoeu aiee ouoi aeia", "x")]  # target-like, not flagged
        + [(j, "bcdfg hjklm npqrs twxz", "x") for j in range(200, 210)]
    )
    w = importance_weights(_docs(spark, rows), F.col("lang") == "t")
    got = {r["doc_id"]: r for r in w.collect()}
    assert got[100]["logw"] > max(got[j]["logw"] for j in range(200, 210))
    assert all(got[i]["is_target"] for i in range(10))
    assert not got[100]["is_target"]


def test_select_top_k_deterministic_under_repartition(spark):
    rows = [
        (i, ("aeiou " * (1 + i % 5)) + ("zxq " * (i % 3)), "t" if i % 4 == 0 else "x")
        for i in range(60)
    ]
    base = _docs(spark, rows)
    picks = []
    for n_parts in (1, 7, 32):
        w = importance_weights(base.repartition(n_parts), F.col("lang") == "t")
        picks.append([r["doc_id"] for r in select_top_k(w, k=15).collect()])
    assert picks[0] == picks[1] == picks[2]
    assert len(picks[0]) == 15
