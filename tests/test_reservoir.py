"""Streaming A-ES reservoir (streaming/reservoir.py): the maintained
O(k) sample must equal the batch TakeOrdered reservoir over the union
corpus exactly (the key is a pure per-row expression; top-k is
associative), replays must be no-ops, re-arrivals replace, deletes
shrink (bounded-state honesty — no resurrection), and state never
exceeds k rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.operators.sampling import weighted_reservoir_sample
from worker_spark.sources import load_table
from worker_spark.streaming.reservoir import StreamingReservoir


def _docs(spark):
    return (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_reservoir_converges_to_batch_sample(spark, tmp_path):
    """Three batches — evens with a stale 40-char draft for
    doc_id%10==0 (weight-growing correction: the monotone case), odds,
    corrections — land on the batch A-ES sample bit-for-bit, with the
    state never exceeding k rows at any point."""
    docs = _docs(spark)
    res = StreamingReservoir(spark, str(tmp_path / "r"), k=50)
    stale = F.col("doc_id") % 10 == 0
    res.apply_batch(
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.when(stale, F.substring("text", 1, 40))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    assert res.reservoir().count() <= 50
    res.apply_batch(docs.filter(F.col("doc_id") % 2 == 1))
    assert res.reservoir().count() <= 50
    res.apply_batch(docs.filter(stale))

    want = _rows(weighted_reservoir_sample(docs, k=50))
    assert _rows(res.reservoir()) == want

    # replay of the final batch: identical state
    res.apply_batch(docs.filter(stale))
    assert _rows(res.reservoir()) == want


def test_rearrival_replaces_and_delete_shrinks(spark, tmp_path):
    """A re-arriving doc_id replaces its entry (weight may change); an
    empty-text re-arrival deletes it. A reservoir cannot resurrect an
    evicted item, so the delete leaves k-1 rows until new arrivals
    refill — the documented bounded-state property."""
    docs = _docs(spark).limit(200).localCheckpoint(eager=True)
    res = StreamingReservoir(spark, str(tmp_path / "r"), k=20)
    res.apply_batch(docs)
    before = {r["doc_id"]: r for r in res.reservoir().collect()}
    assert len(before) == 20
    victim = min(before)

    # re-arrival with longer text: weight grows, entry replaced in place
    boosted = docs.filter(F.col("doc_id") == victim).select(
        "doc_id", F.concat(F.col("text"), F.lit(" padding" * 10)).alias("text")
    )
    res.apply_batch(boosted)
    after = {r["doc_id"]: r for r in res.reservoir().collect()}
    assert len(after) == 20
    assert after[victim]["weight"] > before[victim]["weight"]
    assert after[victim]["aes_key_micros"] == before[victim]["aes_key_micros"]

    # delete: the slot empties and is NOT refilled from evicted history
    res.apply_batch(
        spark.createDataFrame([(victim, "")], "doc_id long, text string")
    )
    final = {r["doc_id"]: r for r in res.reservoir().collect()}
    assert victim not in final
    assert len(final) == 19
    # a fresh arrival refills the slot
    res.apply_batch(
        spark.createDataFrame(
            [(10**9, "fresh " * 400)], "doc_id long, text string"
        )
    )
    assert res.reservoir().count() == 20
