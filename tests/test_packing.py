"""Sequence-packing operator: greedy semantics, oversize/blank docs, stats."""

from __future__ import annotations

from worker_spark.operators.packing import greedy_pack, pack_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_greedy_pack_boundaries(spark):
    # budget 5, one shard: [3, 3] split, [2, 3] fits, oversize doc alone
    rows = [
        (0, "a b c"),        # 3 -> pack 0
        (1, "d e f"),        # 3 -> exceeds 5, pack 1
        (2, "g h"),          # 2 -> pack 1 (total 5, fits exactly)
        (3, "x " * 7),       # 7 > budget -> own pack 2
        (4, "y"),            # 1 -> pack 3 (previous pack already over)
    ]
    got = {
        r["doc_id"]: r["pack_seq"]
        for r in greedy_pack(_docs(spark, rows), budget=5, n_shards=1).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_blank_doc_costs_one_slot(spark):
    rows = [(0, "   "), (1, ""), (2, "a b c d")]
    out = {
        r["doc_id"]: (r["n_tokens"], r["pack_seq"])
        for r in greedy_pack(_docs(spark, rows), budget=5, n_shards=1).collect()
    }
    # blanks count 0 tokens but weigh 1 slot each: 1 + 1 + 4 > 5 -> split
    assert out == {0: (0, 0), 1: (0, 0), 2: (4, 1)}


def test_shards_pack_independently(spark):
    rows = [(i, "t " * 4) for i in range(10)]  # 4 tokens each
    packed = greedy_pack(_docs(spark, rows), budget=8, n_shards=2)
    stats = {
        (r["shard"], r["pack_seq"]): (r["n_docs"], r["pack_tokens"])
        for r in pack_stats(packed, budget=8).collect()
    }
    # 5 docs per shard, 2 per pack (8 tokens), trailing pack of 1
    for shard in (0, 1):
        assert stats[(shard, 0)] == (2, 8)
        assert stats[(shard, 1)] == (2, 8)
        assert stats[(shard, 2)] == (1, 4)
