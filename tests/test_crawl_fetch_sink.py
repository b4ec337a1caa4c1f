"""Tests for the recursive crawl (E7 + §3.2 fixpoint), the partitioned
fetch stage (S2 + T7 retries), and the chunked search sink (S9)."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from worker_spark import fixtures as FX
from worker_spark.plans.crawl import child_place_ids_col, crawl_closure, place_child_edges
from worker_spark.plans.sinks import foreach_partition_sink, write_search_documents
from worker_spark.sources.fetch_sim import fetch_articles, is_transient, with_retries


def test_child_place_extraction(spark):
    entry_schema = "id: bigint, entry: struct<child_places: array<struct<place_id: bigint>>>"
    df = spark.createDataFrame(
        [
            (1, {"child_places": [{"place_id": 2}, {"place_id": 3}, {"place_id": None}]}),
            (2, {"child_places": []}),
            (3, {"child_places": None}),
        ],
        schema=entry_schema,
    )
    got = {r["id"]: r["kids"] for r in df.select("id", child_place_ids_col(F.col("entry")).alias("kids")).collect()}
    assert got == {1: [2, 3], 2: [], 3: []}
    edges = place_child_edges(df)
    assert {(r["parent_id"], r["child_id"]) for r in edges.collect()} == {(1, 2), (1, 3)}


def test_crawl_closure_bfs(spark):
    # chain 1 -> 2 -> 3 -> 4 plus a cycle 4 -> 1 and an unreachable 9 -> 10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (9, 10)], schema="parent_id: bigint, child_id: bigint"
    )
    seeds = spark.createDataFrame([(1,)], schema="id: bigint")
    got = {r["id"]: r["depth"] for r in crawl_closure(seeds, edges).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # cycle terminates, 9/10 unreached


def test_crawl_depth_guard(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], schema="parent_id: bigint, child_id: bigint"
    )
    seeds = spark.createDataFrame([(0,)], schema="id: bigint")
    got = crawl_closure(seeds, edges, max_depth=5)
    assert got.count() == 6  # seed + 5 levels


def test_fetch_articles_partitioned(spark):
    corpus = {("no", 1): FX.DEEP_ARTICLE, ("no", 2): {}}

    def resolver(dictionary: str, article_id: int):
        return corpus.get((dictionary, article_id))

    keys = spark.createDataFrame(
        [("no:1",), ("no:2",), ("no:404",), ("garbage",)], schema="job_key: string"
    )
    got = {r["job_key"]: r for r in fetch_articles(keys, resolver, num_partitions=2).collect()}
    assert got["no:1"]["found"] is True
    assert json.loads(got["no:1"]["data_json"])["lemmas"][0]["lemma"] == "djupord"
    assert got["no:2"]["found"] is True
    assert got["no:404"]["found"] is False  # 404 -> reset-to-idle path
    assert got["garbage"]["found"] is False and got["garbage"]["article_id"] is None


def test_retry_classification_and_backoff():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("connect timeout")
        return "ok"

    assert with_retries(flaky, attempts=4, backoff_base=0.001)() == "ok"
    assert calls["n"] == 3

    def fatal():
        raise RuntimeError("404 not found")

    with pytest.raises(RuntimeError):
        with_retries(fatal, attempts=4, backoff_base=0.001)()
    assert is_transient(RuntimeError("503 service unavailable"))
    assert not is_transient(RuntimeError("404 not found"))


def test_search_sink_chunking(spark, tmp_path):
    docs = spark.range(120).select(
        F.col("id").alias("article_id"),
        F.when(F.col("id") % 2 == 0, "bm").otherwise("nn").alias("dictionary"),
    )
    out = str(tmp_path / "search_docs")
    write_search_documents(docs, out, max_records_per_file=25)
    files = glob.glob(f"{out}/dictionary=*/*.parquet")
    assert len(files) >= 4  # 60 rows per dictionary / 25-cap => >= 3 files each
    assert spark.read.parquet(out).count() == 120

    # live-sink shape: batches capped at batch_size, all rows delivered
    # (executor-side push -> count via accumulators)
    rows_acc = spark.sparkContext.accumulator(0)
    oversize_acc = spark.sparkContext.accumulator(0)

    def push(batch):
        if len(batch) > 30:
            oversize_acc.add(1)
        rows_acc.add(len(batch))

    foreach_partition_sink(docs.repartition(4), push, batch_size=30)
    assert rows_acc.value == 120
    assert oversize_acc.value == 0
