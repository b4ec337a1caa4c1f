"""Edit-distance fuzzy dedup: banded candidates + levenshtein verify."""

from __future__ import annotations

from worker_spark.operators.dedup import edit_distance_near_dups


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: bigint, text: string")


def test_small_edit_detected_with_exact_distance(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy dog", "lazy cat", 1)  # dog->cat: 3 subs
    df = _docs(spark, [(1, base), (2, edited), (3, "entirely different words " * 8)])
    got = {(r["id_a"], r["id_b"]): r for r in edit_distance_near_dups(df).collect()}
    assert (1, 2) in got
    assert got[(1, 2)]["edit_distance"] == 3
    assert got[(1, 2)]["rel_distance"] < 0.02
    assert not any(3 in k for k in got)


def test_reordered_text_fails_sequence_verify(spark):
    # same word multiset, shuffled order: shingle/Jaccard-style verifies
    # would pass; the sequence-aware edit distance must reject
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"] * 6
    fwd = " ".join(words)
    rev = " ".join(reversed(words))
    got = edit_distance_near_dups(_docs(spark, [(1, fwd), (2, rev)])).collect()
    assert got == []
