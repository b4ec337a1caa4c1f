"""Dedup evaluation harness: deterministic planting + recall floors.

Floors are set from the measured sf0.01 table (see DEDUP_EVAL.md) with
slack for operator-parameter tuning; the planting itself is hash-driven
and fully deterministic, so drift here means the dedup family's
behavior changed, not the harness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.operators.dedup_eval import (
    PLANT_OFFSET,
    PLANT_STRIDE,
    TIERS,
    evaluate_dedup,
    planted_corpus,
    truth_pairs,
)
from worker_spark.sources import load_table


def test_planting_is_deterministic_and_tiered(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    c1 = planted_corpus(docs)
    c2 = planted_corpus(docs)
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0
    n_docs = docs.count()
    n_planted = docs.filter(F.col("doc_id") % PLANT_STRIDE == 0).count()
    assert c1.count() == n_docs + n_planted
    # tier-0 plants are byte-identical copies of their originals
    t = truth_pairs(docs)
    tier0 = t.filter(F.col("tier") == 0)
    orig = c1.alias("o")
    dup = c1.alias("d")
    joined = (
        tier0.join(orig, tier0.id_a == F.col("o.doc_id"))
        .join(dup, tier0.id_b == F.col("d.doc_id"))
        .select(
            (F.col("o.text") == F.col("d.text")).alias("same"),
        )
    )
    assert all(r["same"] for r in joined.collect())
    # higher tiers perturb: every tier-3 plant differs from its original
    tier3 = t.filter(F.col("tier") == len(TIERS) - 1)
    joined3 = (
        tier3.join(orig, tier3.id_a == F.col("o.doc_id"))
        .join(dup, tier3.id_b == F.col("d.doc_id"))
        .select((F.col("o.text") == F.col("d.text")).alias("same"))
    )
    assert not any(r["same"] for r in joined3.collect())


def test_truth_pairs_shape(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    t = truth_pairs(docs).collect()
    assert all(r["id_b"] == r["id_a"] + PLANT_OFFSET for r in t)
    assert {r["tier"] for r in t} == set(range(len(TIERS)))


def test_dedup_eval_floors_and_cost_ordering(spark):
    rows = {
        r["method"]: r for r in evaluate_dedup(spark, SF_ORACLE)
    }
    exact = rows["exact"]
    mh = rows["minhash_lsh(tau=0.5)"]
    sh = rows["simhash(ham<=3)"]
    ng = rows["ngram_jaccard(tau=0.2)"]
    # every method must find every byte-identical plant
    for r in (exact, mh, sh, ng):
        assert r["recall_t0"] == 1.0
    # measured sf0.01: ngram 1.0/1.0/0.8 at t5/t15/t25 -> loose floors
    assert ng["recall_t5"] >= 0.9
    assert ng["recall_t15"] >= 0.9
    assert ng["recall_t25"] >= 0.6
    # minhash tau=0.5: s-curve holds at t5 (E[j]=0.75), collapses by t25
    assert mh["recall_t5"] >= 0.6
    assert mh["recall_t25"] <= 0.1
    # simhash(ham<=3) is the very-near-dup tool: t5 recall is LOW by
    # design (measured 0.28) — pin the regime, not the exact value
    assert sh["recall_t5"] <= 0.6
    # cost story: the shingle equi-join examines orders of magnitude
    # more candidate pairs than the banded methods
    assert ng["cand_pairs"] > 10 * max(mh["cand_pairs"], sh["cand_pairs"])
    # exact's equi-join only ever pairs true duplicates
    assert exact["cand_pairs"] == exact["found_total"]
    assert exact["planted_precision"] == 1.0


def test_dedup_eval_v2_corpus_realism(spark):
    """The documents_v2 floors (VERDICT r7 item 3): on a Zipf-shaped
    vocabulary, unplanted documents are no longer legitimately
    shingle-similar, so minhash precision against the planted truth
    recovers — the low v1 number was the 31-token corpus's organic
    collisions, not the method's."""
    rows = {
        r["method"]: r
        for r in evaluate_dedup(
            spark, SF_ORACLE, corpus_source="documents_v2"
        )
    }
    mh = rows["minhash_lsh(tau=0.5)"]
    for r in rows.values():
        assert r["recall_t0"] == 1.0
    assert mh["planted_precision"] >= 0.9
    assert rows["exact"]["planted_precision"] == 1.0


def test_semantic_planting_is_deterministic_and_tiered(spark):
    from worker_spark.operators.dedup_eval import (
        EMB_TIERS,
        emb_truth_pairs,
        planted_embeddings,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    c1 = planted_embeddings(emb)
    c2 = planted_embeddings(emb)
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0
    n = emb.count()
    n_planted = emb.filter(F.col("vec_id") % PLANT_STRIDE == 0).count()
    assert c1.count() == n + n_planted
    t = emb_truth_pairs(emb)
    assert {r["tier"] for r in t.collect()} == set(range(len(EMB_TIERS)))
    # tier-0 plants are byte-identical embedding copies; the copy keeps
    # the original's label at every tier
    joined = (
        t.join(c1.alias("o"), t.id_a == F.col("o.vec_id"))
        .join(c1.alias("d"), t.id_b == F.col("d.vec_id"))
        .select(
            "tier",
            (F.col("o.embedding") == F.col("d.embedding")).alias("same"),
            (F.col("o.label") == F.col("d.label")).alias("same_label"),
        )
    )
    rows = joined.collect()
    assert all(r["same_label"] for r in rows)
    assert all(r["same"] for r in rows if r["tier"] == 0)
    assert not any(r["same"] for r in rows if r["tier"] == len(EMB_TIERS) - 1)


def test_semantic_dedup_eval_floors(spark):
    """Floors from the measured sf0.01 table (DEDUP_EVAL.md): the
    label-blocked verifier holds every tier above its tau, semdedup
    compounds IVF-cell blocking (the semantic analog of the lexical
    candidate-stage split), and both verifiably miss the below-tau
    tier-3 rewrites."""
    from worker_spark.operators.dedup_eval import evaluate_semantic_dedup

    rows = {
        r["method"].split("(")[0]: r
        for r in evaluate_semantic_dedup(spark, SF_ORACLE)
    }
    sem, blk = rows["semdedup"], rows["embedding_blocked"]
    # identical copies: both methods must DROP every planted copy (the
    # pruner's honest effectiveness unit, VERDICT r7 item 7)
    assert sem["drop_c0.0"] == 1.0
    assert blk["drop_c0.0"] == 1.0
    # pair attribution can only lose to drop accounting (a dropped copy
    # attributed to an organic cell-mate instead of its planted source)
    for c in ("0.0", "0.5", "2.0", "6.0"):
        assert sem[f"drop_c{c}"] >= sem[f"pair_c{c}"]
        assert blk[f"drop_c{c}"] >= blk[f"pair_c{c}"]
    # above-tau paraphrase tiers: the label-block never misses (the
    # copy keeps its label, cos stays above tau), semdedup pays a
    # cell-hop tax that grows with noise but stays useful
    assert blk["pair_c0.5"] == 1.0
    assert blk["pair_c2.0"] == 1.0
    assert sem["drop_c0.5"] >= 0.6
    assert sem["drop_c2.0"] >= 0.4
    assert sem["drop_c0.5"] >= sem["drop_c2.0"]
    # tier 3 sits below both taus by design: a verified (partial) miss
    assert sem["drop_c6.0"] <= 0.6
    assert blk["drop_c6.0"] <= 0.6
    # cost shape: both candidate stages are bounded blocks, never the
    # full N*(N-1)/2 cross join
    n = (
        load_table(spark, SF_ORACLE, "embeddings").count()
        + load_table(spark, SF_ORACLE, "embeddings")
        .filter(F.col("vec_id") % PLANT_STRIDE == 0)
        .count()
    )
    assert sem["cand_pairs"] < n * (n - 1) / 2
    assert blk["cand_pairs"] < n * (n - 1) / 2
