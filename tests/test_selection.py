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


def test_cluster_balanced_sample_caps_head_cells(spark):
    """Head cells downsample to exactly cap; tail cells survive whole;
    the kept set is deterministic under repartitioning."""
    import math

    from worker_spark.operators.selection import cluster_balanced_sample

    # two well-separated directions; ids divisible by 10 are medoids.
    # 60 vectors near +e1 (head cluster), 5 near +e2 (tail cluster).
    def vec(axis, i, n=8):
        v = [0.0] * n
        v[axis] = 1.0
        v[(axis + 1) % n] = 0.001 * (i % 7)  # tiny jitter, same argmax
        return v

    rows = [(i, vec(0, i)) for i in range(0, 60)] + [
        (100 + i, vec(4, i)) for i in range(5)
    ]
    # make both clusters contain a medoid id (multiples of 10): 0..50
    # serve the head, 100 serves the tail
    emb = spark.createDataFrame(
        rows, schema="vec_id: bigint, embedding: array<double>"
    )
    out = cluster_balanced_sample(emb, centroid_every=10, cap=8)
    rows_out = out.collect()
    by_cell = {}
    for r in rows_out:
        by_cell.setdefault(r["cell_id"], []).append(r)
    for cell, members in by_cell.items():
        n = len(members)
        kept = sum(1 for m in members if m["kept"])
        assert all(m["cell_n"] == n for m in members)
        assert kept == min(n, 8), (cell, n, kept)
    # every vector appears exactly once
    assert sorted(r["vec_id"] for r in rows_out) == sorted(
        i for i, _ in rows
    )
    # deterministic under layout
    again = cluster_balanced_sample(
        emb.repartition(13), centroid_every=10, cap=8
    )
    assert sorted(
        (r["vec_id"], r["kept"]) for r in again.collect()
    ) == sorted((r["vec_id"], r["kept"]) for r in rows_out)
