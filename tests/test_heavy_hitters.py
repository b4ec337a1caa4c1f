"""Streaming Misra-Gries summary (streaming/heavy_hitters.py): the
maintained counters must satisfy the MG error contract against EXACT
corpus counts — est <= true <= est + total_offset for stored tokens,
true <= total_offset for dropped ones (deterministic coverage) — with
state bounded by k rows after every batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.streaming.heavy_hitters import (
    StreamingHeavyHitters,
    batch_token_counts,
)


def test_mg_error_and_coverage_guarantees(spark, tmp_path):
    from worker_spark.sources.synth_corpus import documents_v2

    # the Zipf v2 corpus: vocabulary >> k, so the summary genuinely
    # decays (the v1 fixture's ~31 tokens never trigger a subtraction)
    docs = (
        documents_v2(spark, SF_ORACLE)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    hh = StreamingHeavyHitters(spark, str(tmp_path / "mg"), k=32)
    for residue in range(3):
        hh.apply_batch(docs.filter(F.col("doc_id") % 3 == residue))
        assert hh.counters().count() <= 32  # bounded after EVERY batch

    est = {r["token"]: r["est_cnt"] for r in hh.counters().collect()}
    offset = hh.total_offset()
    assert offset > 0  # the corpus vocabulary exceeds k, so MG decayed
    true = {
        r["token"]: r["est_cnt"]
        for r in batch_token_counts(docs).collect()
    }
    for tok, e in est.items():
        assert e <= true[tok] <= e + offset, (tok, e, true[tok], offset)
    # deterministic coverage: anything above the offset MUST be stored
    for tok, t in true.items():
        if t > offset:
            assert tok in est, (tok, t, offset)


def test_mg_merge_matches_single_shot_when_vocab_fits(spark, tmp_path):
    """With vocabulary <= k no subtraction ever fires: the maintained
    summary is EXACT counts and the offset stays zero regardless of how
    the stream was batched."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma"[: 5 + (i % 3) * 5]) for i in range(30)],
        "doc_id long, text string",
    )
    hh = StreamingHeavyHitters(spark, str(tmp_path / "mg"), k=32)
    hh.apply_batch(docs.filter(F.col("doc_id") < 10))
    hh.apply_batch(docs.filter(F.col("doc_id") >= 10))
    assert hh.total_offset() == 0
    est = {r["token"]: r["est_cnt"] for r in hh.counters().collect()}
    true = {
        r["token"]: r["est_cnt"] for r in batch_token_counts(docs).collect()
    }
    assert est == true


def test_mg_replay_is_skipped_by_batch_id_watermark(spark, tmp_path):
    """Counts are additive, so replays must be fenced: a re-delivered
    batch_id at or below the watermark is a no-op (the single-bucket
    swap commits counters + watermark atomically), while a direct call
    (batch_id None) always applies."""
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], "doc_id long, text string"
    )
    hh = StreamingHeavyHitters(spark, str(tmp_path / "mg"), k=8)
    hh.apply_batch(docs, batch_id=0)
    once = sorted(tuple(r) for r in hh.counters().collect())
    assert hh.last_batch_id() == 0
    hh.apply_batch(docs, batch_id=0)  # replay: skipped
    assert sorted(tuple(r) for r in hh.counters().collect()) == once
    hh.apply_batch(docs, batch_id=1)  # genuinely new batch: applies
    twice = {r["token"]: r["est_cnt"] for r in hh.counters().collect()}
    assert twice["alpha"] == 20


def test_mg_scalars_survive_an_all_counters_dropped_merge(spark, tmp_path):
    """Ties at the (k+1)-th combined count can drop EVERY counter; the
    sentinel row must still carry the offset and watermark forward (the
    denormalized-onto-counters design silently erased both here —
    review finding)."""
    hh = StreamingHeavyHitters(spark, str(tmp_path / "mg"), k=2)
    hh.apply_batch(
        spark.createDataFrame([(0, "a a a a a")], "doc_id long, text string"),
        batch_id=0,
    )
    assert hh.total_offset() == 0 and hh.last_batch_id() == 0
    # three NEW tokens x5 each: merged = {a:5,b:5,c:5}, (k+1)-th = 5,
    # everything drops
    hh.apply_batch(
        spark.createDataFrame(
            [(1, "b b b b b c c c c c")], "doc_id long, text string"
        ),
        batch_id=1,
    )
    assert hh.counters().count() == 0
    assert hh.total_offset() == 5  # the bound still holds: true(x)=5 <= 5
    assert hh.last_batch_id() == 1  # the replay fence survives too
    hh.apply_batch(
        spark.createDataFrame([(2, "d d")], "doc_id long, text string"),
        batch_id=2,
    )
    est = {r["token"]: r["est_cnt"] for r in hh.counters().collect()}
    assert est == {"d": 2} and hh.total_offset() == 5


def test_mg_direct_call_keeps_watermark_and_lineage_mismatch_raises(
    spark, tmp_path
):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(0, "x y z")], "doc_id long, text string"
    )
    hh = StreamingHeavyHitters(spark, str(tmp_path / "mg"), k=8)
    hh.apply_batch(docs, batch_id=3)
    assert hh.last_batch_id() == 3
    # a direct call applies but never REGRESSES the watermark
    hh.apply_batch(docs)
    assert hh.last_batch_id() == 3
    est = {r["token"]: r["est_cnt"] for r in hh.counters().collect()}
    assert est["x"] == 2  # the direct call genuinely applied
    # a batch id BELOW the watermark is a fresh-checkpoint wiring
    # mistake: loud, not a silent skip
    with _pytest.raises(ValueError, match="below the committed watermark"):
        hh.apply_batch(docs, batch_id=1)
