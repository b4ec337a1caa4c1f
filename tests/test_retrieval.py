"""Collocations + inverted postings: known-corpus outcomes."""

from __future__ import annotations

from worker_spark.operators.retrieval import (
    bigram_collocations,
    inverted_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: bigint, text: string")


def test_collocation_lift_ranks_bound_pairs_first(spark):
    # "new york" always adjacent; "the cat"/"the dog" dilute "the"
    text = ("new york " * 30) + ("the cat " * 30) + ("the dog " * 30)
    got = bigram_collocations(
        _docs(spark, [(1, text)]), min_pair=10, top=5
    ).collect()
    assert got[0]["left_tok"] == "new" and got[0]["right_tok"] == "york"
    # lift of a perfectly-bound pair: N * c(ab) / (c(a)*c(b)) = N/30
    n_total = 180
    assert abs(got[0]["lift"] - n_total * 30 / (30 * 30)) < 1e-6
    lifts = [r["lift"] for r in got]
    assert lifts == sorted(lifts, reverse=True)


def test_inverted_postings_counts_and_order(spark):
    df = _docs(
        spark,
        [(2, "b a b"), (10, "a b b"), (1, "b only here")],
    )
    got = {r["term"]: r for r in inverted_postings(df, min_df=2).collect()}
    assert got["b"]["df"] == 3 and got["b"]["cf"] == 5
    # postings sort bytewise on the doc:tf string in BOTH engines
    # (':' > '0', so "10:2" precedes "1:1")
    assert got["b"]["postings"] == "10:2,1:1,2:2"
    assert got["a"]["df"] == 2 and got["a"]["postings"] == "10:1,2:1"
    assert "only" not in got  # df 1 < min_df


def test_bm25f_title_weight_outranks_body_hit(spark):
    """The field-priority semantics BM25F exists for (S10 ranking
    rules): the same term matching in the x3-weighted title must
    outrank its match buried in the body of an otherwise-identical
    document — and with weights {field: 1} the scorer must degrade to
    plain single-field BM25 over the concatenation."""
    from worker_spark.operators.retrieval import bm25_topk, bm25f_topk

    docs = spark.createDataFrame(
        [
            (1, "apple", "pear plum cherry"),
            (2, "plum", "apple pear cherry"),
            (3, "grape", "pear plum cherry"),
        ],
        "doc_id long, title string, text string",
    )
    ranked = bm25f_topk(docs, ["apple"], k=3).collect()
    assert [r["doc_id"] for r in ranked] == [1, 2]  # title hit first
    assert ranked[0]["bm25f"] > ranked[1]["bm25f"]

    # weight-1 degeneracy: identical scores to single-field BM25 over
    # the concatenated text (same tf, dl, df, N by construction)
    flat = docs.selectExpr("doc_id", "concat(title, ' ', text) AS text")
    uni = {
        (r["doc_id"]): r["bm25"]
        for r in bm25_topk(flat, ["apple"], k=3).collect()
    }
    f1 = {
        (r["doc_id"]): r["bm25f"]
        for r in bm25f_topk(
            docs, ["apple"], field_weights={"title": 1, "text": 1}, k=3
        ).collect()
    }
    assert uni == f1
