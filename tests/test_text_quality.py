"""Unit/property tests for the round-3 quality & curation operators:
Gopher rule gate, char-bigram LM scoring, deterministic split/shard
assignment, temperature mixture weights. (Cross-engine parity for the
registered queries is covered by test_oracle_parity.)"""

from __future__ import annotations

from worker_spark.operators import sampling as S
from worker_spark.operators import text as T
from worker_spark.sources import load_table

from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs back home to "
    "rest because that long chase made it tired so it naps with joy " * 3
)


def test_gopher_rules_pass_and_fail(spark):
    rows = [
        (1, GOOD),  # long, alpha, stopword-rich -> passes
        (2, "short text"),  # fails word count
        (3, " ".join(["####"] * 120)),  # symbol ratio + alpha + stopwords fail
        (4, " ".join(["supercalifragilistic"] * 120)),  # mean word len > 10
        (5, "- one\n- two\n- three\n- four"),  # bullets + word count
    ]
    out = {
        r["doc_id"]: r
        for r in T.with_gopher_rules(_docs(spark, rows)).collect()
    }
    assert out[1]["passes_gopher"]
    assert not out[2]["rule_word_count"]
    assert not out[3]["rule_symbol_ratio"]
    assert not out[3]["rule_alpha_words"]
    assert not out[4]["rule_mean_word_len"]
    assert not out[5]["rule_bullet_lines"]
    assert all(not out[i]["passes_gopher"] for i in (2, 3, 4, 5))


def test_gopher_rules_empty_text(spark):
    row = T.with_gopher_rules(_docs(spark, [(1, "")])).collect()[0]
    assert row["n_words"] == 0
    assert not row["passes_gopher"]
    assert row["mean_word_len"] == 0.0


def test_bigram_lm_scores_rank_gibberish_below_natural(spark):
    # model trained on the batch itself: repeated natural English bigrams
    # dominate the model, the base64-ish blob lands in the tail
    rows = [(i, GOOD) for i in range(1, 9)] + [
        (9, "qZx9Kj2wV7pLmN0yTqRb3sHdF1cGxAeUoI8vWkM5zYnB6rDtEJ4hPaSgClQuXf")
    ]
    out = {r["doc_id"]: r["avg_logp"] for r in T.bigram_lm_scores(_docs(spark, rows)).collect()}
    assert out[9] < out[1] - 1.0  # gibberish is far below corpus-normal
    # identical docs score identically
    assert out[1] == out[2]


def test_bigram_lm_ignores_short_docs(spark):
    out = T.bigram_lm_scores(_docs(spark, [(1, "x"), (2, "ab")])).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert out[0]["n_bigrams"] == 1


def test_split_assign_partitions_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = S.split_assign(docs, id_col="doc_id").select(
        "doc_id", "split", "shard", "shuffle_key"
    )
    rows = a.collect()
    n = len(rows)
    frac_train = sum(r["split"] == "train" for r in rows) / n
    assert 0.93 <= frac_train <= 1.0  # 98% nominal, small-sample noise
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(0 <= r["shard"] < 8 for r in rows)
    # re-running yields the identical assignment (no rand())
    again = {r["doc_id"]: (r["split"], r["shard"], r["shuffle_key"]) for r in rows}
    for r in S.split_assign(docs, id_col="doc_id").collect():
        assert again[r["doc_id"]] == (r["split"], r["shard"], r["shuffle_key"])


def test_split_assign_salt_redeals(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    v1 = {r["doc_id"]: r["split_bucket"] for r in S.split_assign(docs, id_col="doc_id", salt="v1").collect()}
    v2 = {r["doc_id"]: r["split_bucket"] for r in S.split_assign(docs, id_col="doc_id", salt="v2").collect()}
    assert any(v1[k] != v2[k] for k in v1)


def test_mixture_weights_normalize_and_flatten(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = S.mixture_weights(docs, strat_col="source").collect()
    total_w = sum(r["mix_weight"] for r in out)
    assert abs(total_w - 1.0) < 1e-4
    # sqrt temperature flattens: the largest stratum's weight share must be
    # smaller than its raw share, the smallest one's larger
    big = max(out, key=lambda r: r["stratum_rows"])
    small = min(out, key=lambda r: r["stratum_rows"])
    if big["stratum_rows"] != small["stratum_rows"]:
        assert big["mix_weight"] < big["share"]
        assert small["mix_weight"] > small["share"]
    # epochs is the duplication factor realizing the mixture
    for r in out:
        assert r["epochs"] > 0


def test_curation_reject_reason_priority(spark):
    """A document failing several gates reports the FIRST failing gate in
    the fixed priority order (lang > quality > repetition > lm > gopher)."""
    from worker_spark.queries.textops import q_doc_curation_decision

    # run on the oracle corpus and validate the invariants per row
    rows = q_doc_curation_decision(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    for r in rows:
        if r["reject_reason"] == "lang_und":
            assert r["pred_lang"] == "und"
        elif r["reject_reason"] == "low_quality":
            assert r["pred_lang"] != "und" and r["quality_score"] < 0.5
        elif r["reject_reason"] == "kept":
            assert r["keep"] and r["pred_lang"] != "und"
            assert r["quality_score"] >= 0.5 and r["passes_gopher"]
        if r["keep"]:
            assert r["reject_reason"] == "kept"
    reasons = {r["reject_reason"] for r in rows}
    assert "kept" in reasons and len(reasons) >= 4  # real decision spread


def test_ngram_novelty_counts_exactly(spark):
    """Hand-checkable bigram novelty: shared bigrams score 0, unique
    ones 1; docs shorter than n are absent."""
    from worker_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c"),      # bigrams: "a b", "b c"
            (2, "a b d"),      # bigrams: "a b", "b d"
            (3, "x"),          # too short: absent
            (4, "p q"),        # bigram "p q": unique
        ],
        schema="doc_id: bigint, text: string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, n=2).collect()}
    assert set(got) == {1, 2, 4}
    # doc 1: "a b" shared (df=2), "b c" unique -> 1/2
    assert got[1]["n_shingles"] == 2 and got[1]["n_novel"] == 1
    assert abs(got[1]["novelty"] - 0.5) < 1e-9
    assert got[2]["n_novel"] == 1
    assert got[4]["n_shingles"] == 1 and got[4]["novelty"] == 1.0


def test_ngram_novelty_repeated_shingle_in_one_doc_counts_once(spark):
    """Distinct-per-doc contract: a shingle repeated inside ONE doc
    still has df=1 and stays novel."""
    from worker_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b a b")],  # bigrams: "a b" (x2, distinct once), "b a"
        schema="doc_id: bigint, text: string",
    )
    (r,) = ngram_novelty(docs, n=2).collect()
    assert r["n_shingles"] == 2 and r["n_novel"] == 2
    assert r["novelty"] == 1.0


def test_ngram_novelty_totals_match_word_shingles(spark):
    """Drift pin for the deliberately-inlined shingle construction
    (operators/text.ngram_novelty builds the per-doc shingle ARRAY
    itself so totals stay map-only — see its docstring): n_shingles
    must equal dedup.word_shingles' per-doc distinct counts on the
    same corpus, so the two definitions cannot diverge silently."""
    from pyspark.sql import functions as F

    from worker_spark.operators.dedup import word_shingles
    from worker_spark.operators.text import ngram_novelty
    from worker_spark.sources.synth_corpus import documents_v2

    from tests.conftest import SF_ORACLE

    docs = documents_v2(spark, SF_ORACLE)
    got = {
        r["doc_id"]: r["n_shingles"]
        for r in ngram_novelty(docs, n=2).collect()
    }
    want = {
        r["id"]: r["cnt"]
        for r in word_shingles(docs, n=2)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
