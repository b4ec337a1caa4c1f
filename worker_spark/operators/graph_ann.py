"""Graph ANN: HNSW-style greedy beam search over a k-NN graph, Spark-first.

HNSW itself (Malkov & Yashunin 2016, public preprint) is an inherently
sequential index — vectors insert one at a time, each insertion mutating
shared adjacency lists — which is the wrong shape for a 1000-executor
cluster. The distributable re-expression keeps the two ideas that matter
(a navigable neighborhood graph; greedy best-first search with a beam)
and swaps the sequential parts for set-at-a-time DataFrame stages, the
same move DiskANN-style systems make for offline index builds:

* **Graph build** — candidate pairs come from IVF cells with
  MULTI-ASSIGNMENT (each vector joins its top-2 centroid cells, so
  boundary vectors bridge adjacent cells and the graph is navigable
  ACROSS cells, not a disjoint union of cell cliques); each node keeps
  its ``degree`` best neighbors by cosine, then reverse edges are
  unioned in (undirected k-NN graph). The pair stage is a cell-id
  equi-join — ~N * cell_size pairs, never N^2 — and the top-degree cut
  is one window.

  Build cost honesty (scaling probe, NOTES.md): with a FIXED
  ``centroid_every`` stride, centroid count K = N/stride, so the
  assignment stage scores N*K = N^2/stride pairs — the probe measures
  the build ~linear at 10x demo volume but the quadratic term dominates
  beyond that. The knob is ``centroid_every``, and its DEFAULT is now
  "auto" (VERDICT r5 item 3): ``auto_centroid_every`` derives the
  stride from one corpus count so K ~ sqrt(N * n_assign), balancing
  assignment (N*K) against pair volume (N^2 * n_assign / K) for an
  O(N^1.5) build with no caller tuning — the cost floor for any
  bucketed one-shot k-NN construction — with a min-stride floor of 100
  that guards small-N recall (cell size equals the stride; the measured
  cliff is in auto_centroid_every's docstring). Probe rows
  graph_knn_edges_auto vs the stride-100 row show the cost shape. The
  registered oracle queries pin stride 100 explicitly: their cell
  structure must be data-independent for hash-stable replay. Production systems then run NN-descent
  refinement rounds (each the same join+window shape) to reach
  near-linear incremental maintenance. Per-query SEARCH cost is
  unaffected — it stays O(entry + hops*beam*degree) regardless of N.
* **Search** — queries enter at their ``entry_probes`` nearest medoid
  nodes, then ``hops`` rounds of: expand the current best ``beam``
  nodes through the edge table (equi-join), score new candidates
  against the broadcast query block, fold into the visited set. Fixed
  hop count + rounded-sim/id tie-breaks make the whole walk a
  deterministic function of the data, so the unrolled search replays
  exactly in the DuckDB oracle (each hop one CTE stage) — no RNG, no
  insertion order, no float accumulation ambiguity.

Cost shape per query: entry_probes + hops * beam * avg_degree exact
scores — independent of corpus size N once the graph is built (contrast
IVF's nprobe/K * N). Recall evidence: operators/ann_eval.py row
"graph_ann" in ANN_EVAL.md.

No reference counterpart file — LLM-pipeline extension (SURVEY.md §2
similarity family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from worker_spark.operators.similarity import (
    _dot,
    _norm,
    resolve_centroid_stride,
)

GRAPH_DEGREE = 6  # kept out-neighbors per node (pre reverse-union)
GRAPH_BEAM = 8  # expanded nodes per query per hop
GRAPH_HOPS = 3  # fixed unrolled search depth
GRAPH_ASSIGN = 2  # cells each node joins for edge building (bridges cells)
GRAPH_ENTRY_PROBES = 2  # medoid entry points per query
NND_FANOUT = 2 * GRAPH_DEGREE  # per-node adjacency slice for 2-hop expansion


GRAPH_MIN_STRIDE = 100  # floor on the auto stride == min CELL size (below)


def auto_centroid_every(
    n: int, n_assign: int = GRAPH_ASSIGN, min_stride: int = GRAPH_MIN_STRIDE
) -> int:
    """The build-knob derivation (VERDICT r5 item 3): pick the centroid
    STRIDE that realizes K ~ sqrt(N * n_assign) centroids, balancing the
    assignment stage's N*K scored pairs against the pair stage's
    ~N * stride * n_assign volume — both land at N^1.5 * sqrt(n_assign),
    the floor for any one-shot bucketed k-NN build.
    stride = N / K = sqrt(N / n_assign). Thin wrapper over the family's
    shared derivation (similarity.auto_centroid_stride — the IVF-PQ
    operators use the same rule with n_assign=1) carrying the graph
    build's multi-assignment default.

    The ``min_stride`` floor is a RECALL guarantee, not a cost term:
    cell size equals the stride, so the raw sqrt starves cells at small
    N — measured at sf0.1 (N=2000), removing the floor drops search
    recall@10 from 0.975 (stride 100) to 0.425 (stride 32), because a
    degree-6 cut from a ~64-candidate pool prunes the long-range bridges
    beam search navigates by. The floor changes nothing asymptotically:
    sqrt(N / n_assign) overtakes it at N = min_stride^2 * n_assign
    (20k at defaults), beyond which cells grow as sqrt(N) and the
    small-N regime never returns. tools/scaling_probe.py measures both
    the floored and fixed-stride builds; NOTES.md tables the pair-volume
    arithmetic out to 10^9 vectors."""
    from worker_spark.operators.similarity import auto_centroid_stride

    return auto_centroid_stride(n, n_assign, min_stride)


def _cos(a_vec: str, a_norm: str, b_vec: str, b_norm: str):
    return F.round(
        F.try_divide(
            _dot(F.col(a_vec), F.col(b_vec)),
            F.col(a_norm) * F.col(b_norm),
        ),
        6,
    )


def _ranked_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cell_id, _rn) — every vector's centroid cells ranked by
    ivf_assign's scoring convention (rounded 6dp, ties to the smaller
    centroid id). Computed ONCE; callers slice by rank (src side keeps
    top-n, dst side keeps rank 1) instead of re-scoring N x K."""
    c = centroids.select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("cent_vec"),
        _norm(F.col(vec_col)).alias("cent_norm"),
    )
    v = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vvec"),
        _norm(F.col(vec_col)).alias("_vnorm"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "_vid",
        "cent_id",
        _cos("_vvec", "_vnorm", "cent_vec", "cent_norm").alias("_sim"),
    )
    w = Window.partitionBy("_vid").orderBy(
        F.desc_nulls_last("_sim"), F.asc("cent_id")
    )
    return scored.withColumn("_rn", F.row_number().over(w)).select(
        F.col("_vid").alias(id_col),
        F.col("cent_id").alias("cell_id"),
        "_rn",
    )


def knn_graph_edges(
    vectors: DataFrame,
    centroid_every="auto",
    degree: int = GRAPH_DEGREE,
    n_assign: int = GRAPH_ASSIGN,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Undirected k-NN graph edges (src, dst, sim): the SOURCE side joins
    each of its ``n_assign`` nearest cells while the destination side
    sits only in its primary cell — boundary sources still bridge
    adjacent cells (and reverse edges propagate the bridge), but every
    candidate pair is generated exactly once (no distinct pass) and the
    scored-pair volume is halved vs assigning both sides twice. Then
    top-``degree`` per source by cosine, reverse edges unioned in (so
    in-degree-only nodes stay reachable).

    ``centroid_every`` defaults to "auto" (VERDICT r5 item 3): the
    stride is derived from the corpus count as sqrt(N / n_assign), which
    keeps the build inside the documented O(N^1.5) envelope at ANY
    corpus size with no caller tuning (tools/scaling_probe.py measures
    the exponent). Pass an int to pin a data-independent cell structure
    (the registered queries pin 100 so their oracle replay is
    hash-stable)."""
    centroid_every = resolve_centroid_stride(
        vectors, centroid_every, n_assign, id_col
    )
    centroids = vectors.filter(F.col(id_col) % centroid_every == 0)
    # one N x K scoring pass serves both slices; the checkpoint stops the
    # two branches from re-running it (slim: <= n_assign rows per vector)
    ranked = (
        _ranked_assign(vectors, centroids, id_col, vec_col)
        .filter(F.col("_rn") <= n_assign)
        .localCheckpoint(eager=False)
    )
    src_cells = ranked.drop("_rn")
    dst_cells = ranked.filter(F.col("_rn") == 1).drop("_rn")
    norms = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    a = norms.join(
        src_cells.withColumnRenamed(id_col, "_id"), "_id"
    ).select(
        F.col("_id").alias("src"),
        F.col("_vec").alias("_va"),
        F.col("_n").alias("_na"),
        "cell_id",
    )
    b = norms.join(
        dst_cells.withColumnRenamed(id_col, "_id"), "_id"
    ).select(
        F.col("_id").alias("dst"),
        F.col("_vec").alias("_vb"),
        F.col("_n").alias("_nb"),
        "cell_id",
    )
    pairs = (
        a.join(b, "cell_id")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "dst", _cos("_va", "_na", "_vb", "_nb").alias("sim")
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.desc_nulls_last("sim"), F.asc("dst")
    )
    fwd = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= degree)
        .select("src", "dst", "sim")
    )
    return fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
        )
    ).distinct()


def graph_ann_search(
    queries: DataFrame,
    vectors: DataFrame,
    edges: DataFrame,
    k: int = 10,
    beam: int = GRAPH_BEAM,
    hops: int = GRAPH_HOPS,
    entry_probes: int = GRAPH_ENTRY_PROBES,
    centroid_every: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_visited: bool = False,
) -> DataFrame:
    """Beam search over the k-NN graph: per query, score the
    ``entry_probes`` nearest medoid nodes, then ``hops`` times expand the
    current ``beam`` best visited nodes through ``edges`` and score the
    (distinct) new candidates. Output (q_id, c_id, cos_sim, rnk): top-k
    of everything visited, self excluded. The query block is broadcast
    at every scoring stage; each hop's candidate generation is an
    equi-join on the frontier node id."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    cvec = vectors.select(
        F.col(id_col).alias("node"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    medoids = cvec.filter(F.col("node") % centroid_every == 0)
    entry_scored = medoids.crossJoin(F.broadcast(q)).select(
        "q_id", "node", _cos("q_vec", "q_norm", "c_vec", "c_norm").alias("sim")
    )
    we = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("sim"), F.asc("node")
    )
    visited = (
        entry_scored.withColumn("_rn", F.row_number().over(we))
        .filter(F.col("_rn") <= entry_probes)
        .select("q_id", "node", "sim")
    )
    wb = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("sim"), F.asc("node")
    )
    for _hop in range(hops):
        frontier = (
            visited.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= beam)
            .select("q_id", "node")
        )
        cand = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("q_id", F.col("dst").alias("node"))
            .distinct()
        )
        scored = cand.join(F.broadcast(q), "q_id").join(cvec, "node").select(
            "q_id",
            "node",
            _cos("q_vec", "q_norm", "c_vec", "c_norm").alias("sim"),
        )
        # sims are a deterministic rounded function of (q, node), so the
        # exact-duplicate rows from re-scoring already-visited nodes
        # collapse under distinct(). localCheckpoint cuts the lineage:
        # visited feeds BOTH the next frontier and the next union, so an
        # uncheckpointed plan re-executes every earlier hop twice per
        # level — the same union-recompute trap connected_components
        # fixed (NOTES.md); measured 13.6s -> ~5s on the sf0.1 bench.
        visited = visited.unionByName(scored).distinct().localCheckpoint(
            eager=False
        )
    if return_visited:
        # the full visited set (pre top-k, self included) — the eval
        # harness counts it as the search-time scored-pair volume
        return visited
    wk = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("sim"), F.asc("node")
    )
    return (
        visited.filter(F.col("q_id") != F.col("node"))
        .withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            F.col("node").alias("c_id"),
            F.col("sim").alias("cos_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def graph_ann_topk(
    vectors: DataFrame,
    query_stride: int = 20,
    k: int = 5,
    centroid_every="auto",
    degree: int = GRAPH_DEGREE,
    n_assign: int = GRAPH_ASSIGN,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **search_kwargs,
) -> DataFrame:
    """Build + search in one call (the registered-query shape): queries
    are the ``query_stride`` medoid rows, graph built over the full
    corpus. ``centroid_every`` ("auto" = derive the O(N^1.5) stride from
    the corpus count, resolved ONCE here) is threaded to BOTH the build
    and the search so the cell structure and the entry medoids always
    agree (silently diverging centroid sets was a review finding);
    remaining ``search_kwargs`` (beam, hops, entry_probes) go to the
    search."""
    centroid_every = resolve_centroid_stride(
        vectors, centroid_every, n_assign, id_col
    )
    queries = vectors.filter(F.col(id_col) % query_stride == 0)
    # the search joins the edge table once per hop: materialize the build
    # once (non-eager: piggybacks on the first hop's action) instead of
    # re-running the pair join + degree window every hop
    edges = knn_graph_edges(
        vectors,
        centroid_every=centroid_every,
        degree=degree,
        n_assign=n_assign,
        id_col=id_col,
        vec_col=vec_col,
    ).localCheckpoint(eager=False)
    return graph_ann_search(
        queries,
        vectors,
        edges,
        k=k,
        centroid_every=centroid_every,
        id_col=id_col,
        vec_col=vec_col,
        **search_kwargs,
    )


def nn_descent_round(
    vectors: DataFrame,
    edges: DataFrame,
    degree: int = GRAPH_DEGREE,
    fanout: int = NND_FANOUT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One NN-descent refinement round (Dong, Moses & Li, WWW 2011):
    "a neighbor of a neighbor is likely a neighbor". Candidates are the
    2-hop pairs of the current undirected graph; only pairs NOT already
    in the graph are cosine-scored (anti join), then every node re-keeps
    its ``degree`` best from old-union-new and reverse edges are
    re-unioned. Output has the same shape and conventions as
    knn_graph_edges, so rounds compose.

    Hub bound (review finding): a node's undirected adjacency is
    degree + in-degree, and in-degree of a hub vector is unbounded in
    any k-NN digraph — a raw edges-join-edges would emit ~deg(m)^2
    candidates per middle node m, i.e. ~N^2 through one strong hub.
    Real NN-descent caps reverse-neighbor sampling (the rho*K knob) for
    exactly this reason; here BOTH join sides use a deterministic
    per-src top-``fanout`` slice of the adjacency (sim DESC, dst ASC —
    the best neighbors are the useful expansion anyway), so the 2-hop
    volume is <= N * fanout^2 regardless of hubness: corpus-linear at
    fixed fanout, the maintenance path past the one-shot bucketed
    build's O(N^1.5) floor.

    Deterministic: the capped adjacency and candidate set are pure
    functions of the edge set, scoring uses the module's rounded-cosine,
    and re-ranking uses the (sim DESC, dst ASC) tie-break — so a fixed
    number of rounds replays exactly in a CTE-unrolled oracle. ``edges``
    is materialized internally (it feeds the capped slice, the anti
    join, and the union — the union-recompute trap callers should not
    have to remember)."""
    edges = edges.localCheckpoint(eager=False)
    wf = Window.partitionBy("src").orderBy(
        F.desc_nulls_last("sim"), F.asc("dst")
    )
    capped = (
        edges.withColumn("_rn", F.row_number().over(wf))
        .filter(F.col("_rn") <= fanout)
        .select("src", "dst")
    )
    two_hop = (
        capped.alias("e1")
        .join(capped.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e1.src") != F.col("e2.dst"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
        .distinct()
    )
    fresh = two_hop.join(
        edges.select("src", "dst"), ["src", "dst"], "left_anti"
    )
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    scored_new = (
        fresh.join(v.withColumnRenamed("_id", "src"), "src")
        .withColumnsRenamed({"_vec": "_va", "_n": "_na"})
        .join(v.withColumnRenamed("_id", "dst"), "dst")
        .select(
            "src", "dst", _cos("_va", "_na", "_vec", "_n").alias("sim")
        )
    )
    allp = edges.unionByName(scored_new)
    w = Window.partitionBy("src").orderBy(
        F.desc_nulls_last("sim"), F.asc("dst")
    )
    fwd = (
        allp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= degree)
        .select("src", "dst", "sim")
    )
    return fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
        )
    ).distinct()
