"""Crawl-frontier scheduler: politeness + collision-freedom guarantees."""

from __future__ import annotations

from collections import defaultdict

from worker_spark.operators.frontier import schedule_frontier


def test_frontier_guarantees(spark):
    rows = [(i, f"host{i % 13}") for i in range(200)]
    df = spark.createDataFrame(rows, schema="doc_id: bigint, source: string")
    got = schedule_frontier(df, n_fetchers=4).collect()
    assert len(got) == 200

    # collision-free: (fetcher, tick) unique
    slots = [(r["fetcher"], r["tick"]) for r in got]
    assert len(slots) == len(set(slots))

    # per-source serialization: one fetcher per source
    by_source = defaultdict(set)
    for r in got:
        by_source[r["source"]].add(r["fetcher"])
    assert all(len(f) == 1 for f in by_source.values())

    # exact politeness: consecutive same-source ticks differ by n_sources
    ticks = defaultdict(list)
    cycle = {}
    for r in got:
        ticks[r["source"]].append(r["tick"])
        cycle[r["source"]] = r["n_sources"]
    for s, ts in ticks.items():
        ts = sorted(ts)
        assert all(b - a == cycle[s] for a, b in zip(ts, ts[1:])), s


def test_frontier_deterministic_under_repartition(spark):
    rows = [(i, f"h{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, schema="doc_id: bigint, source: string")
    a = sorted(map(tuple, schedule_frontier(df).collect()))
    b = sorted(map(tuple, schedule_frontier(df.repartition(13)).collect()))
    assert a == b
