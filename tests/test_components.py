"""Connected-components operator: convergence, determinism, survivor flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.components import cluster_assignments, connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a: bigint, id_b: bigint")


def test_chain_converges_to_min_id(spark):
    # 1-2-3-4-5 chain: diameter 4, needs multiple propagation rounds
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_clusters_and_reversed_edges(spark):
    # two components; edge direction must not matter
    e = _edges(spark, [(7, 3), (3, 9), (20, 30), (40, 20)])
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 30: 20, 40: 20}


def test_cluster_assignments_sizes_and_survivors(spark):
    e = _edges(spark, [(10, 11), (11, 12), (50, 51)])
    rows = cluster_assignments(e).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert set(by_doc) == {10, 11, 12, 50, 51}  # singletons excluded by design
    assert all(by_doc[d]["cluster_id"] == 10 for d in (10, 11, 12))
    assert all(by_doc[d]["cluster_size"] == 3 for d in (10, 11, 12))
    assert all(by_doc[d]["cluster_size"] == 2 for d in (50, 51))
    assert {d for d, r in by_doc.items() if r["is_survivor"]} == {10, 50}


def test_partitioning_invariance(spark):
    # same labels regardless of input partitioning (shuffled layout)
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(2, 4), (6, 8)]
    a = connected_components(_edges(spark, pairs))
    b = connected_components(_edges(spark, pairs).repartition(13, F.col("id_b")))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min reachable id per vertex
    return {x: find(x) for x in list(parent)}


def test_star_cc_matches_union_find_on_varied_graphs(spark):
    import random

    from worker_spark.operators.components import connected_components_star

    rng = random.Random(7)
    graphs = {
        "chain_200": [(i, i + 1) for i in range(200)],
        "cliques": [(c * 100 + i, c * 100 + j) for c in range(3) for i in range(6) for j in range(i + 1, 6)],
        "random": [(rng.randrange(300), rng.randrange(300)) for _ in range(250)],
        "star": [(0, i) for i in range(1, 50)],
    }
    for name, pairs in graphs.items():
        pairs = [(a, b) for a, b in pairs if a != b]
        want = _union_find(pairs)
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(_edges(spark, pairs)).collect()
        }
        assert got == want, name


def test_star_cc_beats_diameter_bound(spark):
    # a 200-node chain has diameter 199: min-label would need ~199 rounds,
    # large-star/small-star must finish within a logarithmic budget
    # (measured: 16 half-rounds = 8 LS/SS cycles)
    from worker_spark.operators.components import connected_components_star

    pairs = [(i, i + 1) for i in range(200)]
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(_edges(spark, pairs), max_iter=16).collect()
    }
    assert set(got.values()) == {0} and len(got) == 201


def test_fallback_contraction_matches_full_run(spark):
    # max_iter far below the chain diameter forces the star fallback;
    # the fallback contracts through the partial min-label progress and
    # must still land on exactly the fixpoint labels (component = min id)
    pairs = [(i, i + 1) for i in range(100, 400)] + [(1, 2), (2, 3)]
    e = _edges(spark, pairs)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        got = {
            r["id"]: r["component"]
            for r in connected_components(e, max_iter=4).collect()
        }
    want = {i: 100 for i in range(100, 401)}
    want.update({1: 1, 2: 1, 3: 1})
    assert got == want
    # the mixed case: one component converges within the budget (clique,
    # absent from the contracted graph) while the chain goes to star —
    # the composition must keep the converged component's labels intact
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        got2 = {
            r["id"]: r["component"]
            for r in connected_components(e, max_iter=3).collect()
        }
    assert got2 == want


def test_incremental_simhash_excludes_within_side_pairs(spark):
    from pyspark.sql import functions as F

    from worker_spark.operators.dedup import simhash_incremental_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),                      # corpus
        (2, base + " extra"),           # corpus near-dup of 1 (must NOT pair)
        (11, base),                     # new near-dup of 1 and 2
        (12, base + " extra"),          # new near-dup too (not vs 11)
        (13, "completely different words entirely unrelated content here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    pairs = {
        (r["new_id"], r["corpus_id"])
        for r in simhash_incremental_pairs(
            docs, is_new=F.col("doc_id") >= 10, max_hamming=3
        ).collect()
    }
    assert (11, 1) in pairs and (12, 2) in pairs
    # no within-side pairs in either direction
    assert not any(a < 10 for a, _ in pairs)
    assert not any(b >= 10 for _, b in pairs)
    assert not any(a == 11 and b == 12 for a, b in pairs)
    assert 13 not in {a for a, _ in pairs}


def test_pagerank_integer_star_graph(spark):
    from worker_spark.operators.components import pagerank_centrality

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], schema="id_a: bigint, id_b: bigint"
    )
    got = {r["doc_id"]: r for r in pagerank_centrality(pairs).collect()}
    assert got[1]["degree"] == 3 and got[2]["degree"] == 1
    # hand-computed 3 iterations of the integer recurrence:
    # r1: a=(15e5*10+85*3e6)//100... center 2_700_000, leaves 433_333
    # r2: center 1_254_999, leaves 915_000
    # r3: center 2_483_250, leaves 505_583
    assert got[1]["rank_int"] == 2_483_250
    assert got[2]["rank_int"] == got[3]["rank_int"] == got[4]["rank_int"] == 505_583
    assert got[1]["rank_int"] > got[2]["rank_int"]
