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


def test_circuit_breaker_opens_and_recovers():
    # T7 breaker semantics (reference src/uib_client.rs:29-85): 10
    # consecutive failures open it, cooldown half-opens it, a successful
    # trial closes it and resets the counter
    from worker_spark.sources.fetch_sim import CircuitBreaker, CircuitOpenError

    now = {"t": 0.0}
    upstream = {"up": False, "calls": 0}

    def flapping():
        upstream["calls"] += 1
        if not upstream["up"]:
            raise RuntimeError("connect timeout")
        return "ok"

    br = CircuitBreaker(threshold=10, cooldown_s=60.0, clock=lambda: now["t"])
    guarded = br.wrap(flapping)

    for _ in range(9):
        with pytest.raises(RuntimeError):
            guarded()
    assert not br.is_open  # 9 consecutive: still closed
    with pytest.raises(RuntimeError):
        guarded()
    assert br.is_open  # 10th opens it

    # open: fails fast WITHOUT touching the upstream
    calls_before = upstream["calls"]
    with pytest.raises(CircuitOpenError):
        guarded()
    assert upstream["calls"] == calls_before

    # cooldown not yet elapsed
    now["t"] = 59.9
    with pytest.raises(CircuitOpenError):
        guarded()

    # half-open trial that fails re-opens for another full cooldown
    now["t"] = 60.0
    with pytest.raises(RuntimeError):
        guarded()
    assert br.is_open
    now["t"] = 100.0
    with pytest.raises(CircuitOpenError):
        guarded()

    # half-open trial that succeeds closes and resets the counter
    now["t"] = 121.0
    upstream["up"] = True
    assert guarded() == "ok"
    assert not br.is_open
    upstream["up"] = False
    with pytest.raises(RuntimeError):
        guarded()
    assert not br.is_open  # counter was reset: one failure doesn't re-open


def test_circuit_open_is_not_transient():
    # an open breaker must stop the retry loop immediately, not be retried
    from worker_spark.sources.fetch_sim import CircuitOpenError

    assert not is_transient(CircuitOpenError("circuit open after 10 failures"))


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


def test_search_sink_writes_index_config(spark, tmp_path):
    # S10: the sink ships the index-settings contract beside the documents
    # (src/meili.rs:273-433); underscore prefix keeps readers off it
    import json

    from worker_spark.plans.index_config import INDEX_CONFIG

    docs = spark.range(10).select(
        F.col("id").alias("article_id"), F.lit("bm").alias("dictionary")
    )
    out = str(tmp_path / "docs_with_cfg")
    write_search_documents(docs, out, max_records_per_file=25)
    with open(f"{out}/_search_index_config.json", encoding="utf-8") as fh:
        cfg = json.load(fh)
    assert set(cfg) == {"articles-bm", "articles-nn", "articles-no",
                        "bibliography", "places"}
    for name, idx in cfg.items():
        assert idx["primary_key"] == "id"
        assert idx["ranking_rules"] == [
            "words", "typo", "proximity", "attribute", "sort", "exactness"]
        assert isinstance(idx["max_total_hits"], int)
    # article indexes: ordered searchable attrs + facet cap (meili.rs:283-357)
    art = cfg["articles-bm"]
    assert art["searchable"][0] == "lemmas" and art["searchable"][-1] == "sub_article_lemmas"
    assert art["sortable"] == ["article_id"]
    assert art["max_total_hits"] == 500_000
    assert art["max_values_per_facet"] == 10_000
    assert cfg["bibliography"]["sortable"] == ["year", "author"]
    assert cfg["places"]["max_total_hits"] == 10_000
    # the artifact must not break reading the parquet dataset
    assert spark.read.parquet(out).count() == 10
    assert cfg == INDEX_CONFIG
