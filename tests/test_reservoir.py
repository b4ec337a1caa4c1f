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


def test_grouped_topk_is_exact_vs_single_window(spark):
    """The salted two-stage reduction must equal the naive single
    window exactly — every true top-k row survives its own salt's
    local top-k a fortiori."""
    from pyspark.sql import Window

    from worker_spark.operators.sampling import grouped_topk

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.xxhash64("id") % 1000).alias("score"),
    ).localCheckpoint(eager=True)
    order = [F.desc("score"), F.asc("doc_id")]
    got = sorted(
        (r["g"], r["doc_id"])
        for r in grouped_topk(df, "g", order, 13, salt_buckets=8).collect()
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        (r["g"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 13)
        .collect()
    )
    assert got == want and len(want) == 7 * 13


def test_stratified_reservoir_converges_per_stratum(spark, tmp_path):
    """Three batches (with a weight-growing stale-draft correction)
    land on the per-stratum batch top-k; a stratum CHANGE on re-arrival
    moves the document between reservoirs."""
    from pyspark.sql import Window

    from worker_spark.operators.sampling import aes_scored
    from worker_spark.streaming.reservoir import (
        StreamingStratifiedReservoir,
    )

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text", F.col("lang").alias("stratum"))
        .localCheckpoint(eager=True)
    )
    res = StreamingStratifiedReservoir(spark, str(tmp_path / "r"), k=20)
    stale = F.col("doc_id") % 10 == 0
    res.apply_batch(
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.when(stale, F.substring("text", 1, 40))
            .otherwise(F.col("text"))
            .alias("text"),
            "stratum",
        )
    )
    res.apply_batch(docs.filter(F.col("doc_id") % 2 == 1))
    res.apply_batch(docs.filter(stale))

    w = Window.partitionBy("stratum").orderBy(F.desc("_r"), F.asc("doc_id"))
    want = sorted(
        tuple(r)
        for r in aes_scored(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "stratum"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("stratum", "doc_id", "weight", "aes_key_micros")
        .collect()
    )
    assert sorted(tuple(r) for r in res.reservoirs().collect()) == want

    # a stratum change on re-arrival MOVES the doc between reservoirs
    member = res.reservoirs().limit(1).collect()[0]
    moved = docs.filter(F.col("doc_id") == member["doc_id"]).select(
        "doc_id", "text", F.lit("zz-moved").alias("stratum")
    )
    res.apply_batch(moved)
    after = res.reservoirs().filter(
        F.col("doc_id") == member["doc_id"]
    ).collect()
    assert len(after) == 1 and after[0]["stratum"] == "zz-moved"
