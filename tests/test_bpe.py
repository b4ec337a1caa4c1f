"""BPE training: greedy merge fold semantics and deterministic round
outcomes on a constructed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.bpe import (
    apply_merge,
    pair_counts,
    to_symbols,
    train_merges,
    word_freqs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: bigint, text: string")


def test_greedy_merge_is_left_to_right_non_overlapping(spark):
    words = spark.createDataFrame(
        [("aaa", 1), ("aaaa", 1), ("banana", 1)],
        schema="word: string, freq: bigint",
    )
    merged = {
        r["word"]: r["syms"]
        for r in apply_merge(to_symbols(words), "a", "a").collect()
    }
    assert merged["aaa"] == ["aa", "a"]  # not ["a", "aa"]
    assert merged["aaaa"] == ["aa", "aa"]
    assert merged["banana"] == ["b", "a", "n", "a", "n", "a"]


def test_pair_counts_weighted_by_frequency(spark):
    words = spark.createDataFrame(
        [("ab", 10), ("abc", 3)], schema="word: string, freq: bigint"
    )
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in pair_counts(to_symbols(words)).collect()
    }
    assert got[("a", "b")] == 13
    assert got[("b", "c")] == 3


def test_train_merges_on_known_corpus(spark):
    # "low" x30, "lower" x20. Round-1 pair counts: (l,o)=50, (o,w)=50,
    # (w,e)=20, (e,r)=20. Batched greedy disjoint selection in rank order:
    # (l,o) kept; (o,w) skipped ('o' used); (e,r) kept; (w,e) skipped
    # ('e' used). Round 2 over [lo,w] x30 / [lo,w,er] x20: (lo,w)=50
    # kept, (w,er) skipped ('w' used).
    docs = _docs(spark, [(1, " ".join(["low"] * 30 + ["lower"] * 20))])
    merges = train_merges(docs, rounds=2)
    assert merges == [
        (1, 1, "l", "o", 50),
        (1, 2, "e", "r", 20),
        (2, 1, "lo", "w", 50),
    ]


def test_select_batch_greedy_disjoint():
    from worker_spark.operators.bpe import select_batch

    cands = [
        ("a", "b", 100),  # kept
        ("b", "c", 90),  # skipped: 'b' used
        ("ab", "x", 80),  # skipped: merged output 'ab' used
        ("c", "d", 70),  # kept
        ("e", "cd", 60),  # skipped: 'cd' is a kept merged output
        ("e", "f", 50),  # kept
    ]
    assert select_batch(cands, batch=16) == [
        ("a", "b", 100),
        ("c", "d", 70),
        ("e", "f", 50),
    ]
    # the batch cap truncates in rank order
    assert select_batch(cands, batch=2) == [
        ("a", "b", 100),
        ("c", "d", 70),
    ]


def test_apply_merges_batch_is_simultaneous(spark):
    from worker_spark.operators.bpe import apply_merges

    words = spark.createDataFrame(
        [("abcd", 1), ("cdab", 1), ("abab", 1)],
        schema="word: string, freq: bigint",
    )
    merged = {
        r["word"]: r["syms"]
        for r in apply_merges(
            to_symbols(words), [("a", "b"), ("c", "d")]
        ).collect()
    }
    assert merged["abcd"] == ["ab", "cd"]
    assert merged["cdab"] == ["cd", "ab"]
    assert merged["abab"] == ["ab", "ab"]


def test_word_freqs_lowercases_and_skips_blank(spark):
    docs = _docs(spark, [(1, "The the THE  fox"), (2, "   ")])
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert got == {"the": 3, "fox": 1}


def test_encode_stats_compression_improves_with_merges(spark):
    from worker_spark.operators.bpe import encode_stats

    docs = _docs(spark, [(1, "low low low lower lowest"), (2, "low lower")])
    got = {r["doc_id"]: r for r in encode_stats(docs, rounds=2).collect()}
    assert got[1]["n_words"] == 5
    assert got[1]["n_chars"] == 3 * 3 + 5 + 6  # low x3, lower, lowest
    # two merges strictly reduce token count below char count
    assert got[1]["n_tokens"] < got[1]["n_chars"]
    assert got[1]["compression"] > 1.0
    assert got[2]["n_words"] == 2


def test_train_merges_rejects_unbounded_driver_collect(spark):
    # the driver-side bound is a contract: scan_cap rows come to the
    # driver each round, so absurd caps (or batch > scan_cap, which the
    # greedy could never satisfy) fail fast instead of OOMing later
    import pytest

    from worker_spark.operators.bpe import BPE_SCAN_CAP_MAX, train_merges

    df = spark.createDataFrame([(1, "ab ab")], "doc_id: bigint, text: string")
    with pytest.raises(ValueError, match="scan_cap"):
        train_merges(df, scan_cap=BPE_SCAN_CAP_MAX + 1)
    with pytest.raises(ValueError, match="batch"):
        train_merges(df, batch=0)
    with pytest.raises(ValueError, match="scan_cap"):
        train_merges(df, batch=64, scan_cap=32)
