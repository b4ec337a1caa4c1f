"""Text-retrieval operators: collocation mining and inverted-index
posting lists.

Both are vocabulary-bounded aggregations — the corpus is touched once
(tokenize + explode), then every shuffle key is a term or a term pair,
so partial aggregation bounds the wire bytes by vocabulary size, not
corpus size. That is the same scale shape as the tf-idf operator
(worker_spark/operators/text.py:125) and the right one at 100 TB.

* ``bigram_collocations`` — adjacent-bigram association strength
  (Church & Hanks, CL 1990: pointwise mutual information). The score is
  emitted as the LIFT ratio N * c(ab) / (c(a) * c(b)) rather than its
  log: the ratio is one double division over exact integers, so it is
  bit-identical across engines (ln's last-ulp behavior is libm-specific)
  and rank-equivalent to PMI.
* ``inverted_postings`` — per-term document posting lists
  (doc_id:tf entries, deterministically sorted), document frequency and
  collection frequency: the structure a search index (reference S9
  surface) is bulk-built from.

No reference counterpart file for collocations; postings re-express the
search-index build surface (SURVEY.md §2 S9) as a queryable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from worker_spark.operators.text import tokens

COLLOC_MIN_PAIR = 20  # minimum bigram count (drops noise collocations)
COLLOC_TOP = 25


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        tokens(F.lower(F.col(text_col))).alias("_toks")
    )


def bigram_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair: int = COLLOC_MIN_PAIR,
    top: int = COLLOC_TOP,
) -> DataFrame:
    """Top collocations by lift = N * c(ab) / (c(a)*c(b)) over adjacent
    lowercase token bigrams; ties break on the token pair so the ranking
    is engine-exact. Output: (left_tok, right_tok, pair_n, left_n,
    right_n, lift)."""
    toked = _doc_tokens(docs, text_col)
    t = F.col("_toks")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i.cast("int")).alias("left_tok"),
                F.element_at(t, (i + 1).cast("int")).alias("right_tok"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<left_tok:string,right_tok:string>>")
    )
    bigrams = (
        toked.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.left_tok").alias("left_tok"),
            F.col("p.right_tok").alias("right_tok"),
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair)
    )
    unigrams = (
        toked.select(F.explode(t).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tok_n"))
    )
    total = unigrams.agg(F.sum("tok_n").alias("n_total"))
    left = unigrams.select(
        F.col("tok").alias("left_tok"), F.col("tok_n").alias("left_n")
    )
    right = unigrams.select(
        F.col("tok").alias("right_tok"), F.col("tok_n").alias("right_n")
    )
    scored = (
        bigrams.join(F.broadcast(left), "left_tok")
        .join(F.broadcast(right), "right_tok")
        .crossJoin(F.broadcast(total))
        .select(
            "left_tok",
            "right_tok",
            "pair_n",
            "left_n",
            "right_n",
            # cast each factor to double BEFORE multiplying: at the 100 TB
            # corpus scale this module targets, n_total*pair_n as a BIGINT
            # product overflows int64 (silent wrap non-ANSI, error under
            # ANSI); double products round once but identically in both
            # engines when the oracle mirrors the cast order
            F.round(
                (F.col("n_total").cast("double") * F.col("pair_n").cast("double"))
                / (F.col("left_n").cast("double") * F.col("right_n").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("left_tok"), F.asc("right_tok")
    ).limit(top)


POSTINGS_MIN_DF = 50


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = POSTINGS_MIN_DF,
) -> DataFrame:
    """Inverted-index posting lists for terms with document frequency >=
    ``min_df``: (term, df, cf, postings) where postings is the
    deterministically-sorted CSV of ``doc_id:tf`` entries. Two shuffles
    (term×doc tf, then term), both vocabulary/posting-bounded."""
    tf = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(":", F.col("doc_id"), F.col("tf"))
                    )
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_term_score(k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The one canonical per-TERM BM25 contribution, as an expression
    over columns (tf, df, dl, n_docs, dl_sum) in scope:
    IDF(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
    IDF = ln(1 + (N - df + 0.5)/(df + 0.5)), rounded to 6dp and cast
    DECIMAL(18,6) so per-term scores sum exactly (a last-ulp ln()
    difference between engines cannot reorder document ranks). Shared by
    the batch scorer (_bm25_scores) and the incrementally-maintained
    index (streaming/retrieval_index.py) — the formula has ONE
    definition, the review policy that consolidated the SQL copies."""
    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    return F.round(
        idf
        * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
            )
        ),
        6,
    ).cast("decimal(18,6)")


def _bm25_scores(
    docs: DataFrame | None,
    qterms: DataFrame,
    query_col: str,
    exclude_self: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    prune_high_df: bool = False,
    weighted_base: DataFrame | None = None,
) -> DataFrame:
    """The shared BM25 scoring core: given a (query_col, term) frame,
    return (query_col, doc_id, bm25) summed per (query, doc). One
    definition serves both the literal-query surface (bm25_topk) and
    the more-like-this surface (hybrid_rrf_topk) so the formula —
    including its rounding scheme — can never drift between them
    (review finding). ``exclude_self`` drops doc_id == query_col rows
    before aggregation (more-like-this queries ARE corpus docs).

    ``prune_high_df`` is max-score-style stop pruning (the WAND family's
    cheapest member): drop query terms with df/N >= 1/2 BEFORE the
    posting join. Such a term's IDF is <= ln(2 - 1/(2N+1)) ~ 0.69 yet
    its posting list is >= N/2 rows — on a Zipf-shaped corpus the ~20
    stopword heads carry the majority of scored rows for near-zero rank
    signal. Exact in integers (2*df < N, no ratio arithmetic), so the
    oracle replays it verbatim. Changes scores only by the pruned
    terms' (bounded, uniform-ish) contribution; OFF by default — the
    v1-corpus queries keep their pinned semantics.

    ``weighted_base`` (BM25F path) supplies a pre-built (doc_id, term,
    w) per-occurrence frame instead of tokenizing ``docs``: tf and dl
    become the integer-weighted sums, everything downstream — df,
    stats, joins, the ONE term-score expression, pruning — is shared
    verbatim, so the multi-field scorer can never drift from the
    single-field one (review finding: no second copy of this chain).
    The single-field path is the w=1 special case of the same sums."""
    if weighted_base is None:
        weighted_base = docs.filter(
            F.length(F.trim(F.col(text_col))) > 0
        ).select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
            F.lit(1).cast("long").alias("w"),
        ).filter(F.length("term") > 0)
    base = weighted_base
    tf = base.groupBy("doc_id", "term").agg(F.sum("w").alias("tf"))
    dl = base.groupBy("doc_id").agg(F.sum("w").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_score = bm25_term_score(k1, b)
    qdf = qterms.join(dfreq, "term")
    if prune_high_df:
        # prune on the TINY (query, term, df) side, before the
        # posting-list join fans out
        qdf = qdf.crossJoin(F.broadcast(stats.select("n_docs"))).filter(
            F.col("df") * F.lit(2) < F.col("n_docs")
        ).drop("n_docs")
    scored = (
        qdf.join(tf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    if exclude_self:
        scored = scored.filter(F.col("doc_id") != F.col(query_col))
    return (
        scored.select(query_col, "doc_id", term_score.alias("ts"))
        .groupBy(query_col, "doc_id")
        .agg(F.sum("ts").alias("bm25"))
    )


def bm25f_topk(
    docs: DataFrame,
    queries: list[str],
    field_weights: dict[str, int] | None = None,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25F multi-field ranking (Robertson/Zaragoza'04, the simple
    weighted-field variant): per-term tf becomes the INTEGER-weighted
    sum over fields, tf~(t,d) = sum_f w_f * tf_f(t,d), document length
    becomes dl~(d) = sum_f w_f * len_f(d), df counts documents holding
    the term in ANY field, and the ONE shared ``bm25_term_score``
    expression scores (tf~, df, dl~, N, dl_sum) exactly as single-field
    BM25 — so a title hit outranks the same hit buried in the body by
    the field weight, which is the scoring-side expression of the
    reference's searchable-attribute priority order (S10 index
    configuration, src/meili.rs:273-433: lemmas rank above definition
    text for the same match).

    Determinism: field weights are integers, so tf~ and dl~ stay exact
    integers and the engine-exactness argument of bm25_topk carries
    over unchanged — the scorer IS _bm25_scores over a weighted base
    (no second copy of the chain; review finding). Scale shape: one
    tokenize+explode per field (union, map-only), then the identical
    vocabulary-bounded aggregates and per-term posting joins as
    bm25_topk."""
    from functools import reduce

    if field_weights is None:
        field_weights = {"title": 3, "text": 1}
    spark = docs.sparkSession
    parts = [
        docs.filter(F.length(F.trim(F.col(fld))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(fld)))).alias("term"),
            F.lit(int(w)).cast("long").alias("w"),
        )
        .filter(F.length("term") > 0)
        for fld, w in field_weights.items()
    ]
    base = reduce(lambda a, b_: a.unionByName(b_), parts)
    qterms = spark.createDataFrame(
        [
            (q, t)
            for q in queries
            for t in dict.fromkeys(q.lower().split())
        ],
        "query string, term string",
    )
    agg = _bm25_scores(
        None, qterms, "query", k1=k1, b=b, weighted_base=base
    ).withColumnRenamed("bm25", "bm25f")
    return _topk_by_query(agg, "query", "bm25f", k)


def _topk_by_query(
    agg: DataFrame, query_col: str, score_col: str, k: int
) -> DataFrame:
    """The shared rank-limited top-k tail (desc score, asc doc_id
    tie-break, typed output) — one definition for the BM25 family."""
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_col,
            "doc_id",
            F.col(score_col).cast("double").alias(score_col),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones, the default
    lexical ranking function of every production search engine — the
    reference's search-index sink S9 feeds exactly this kind of scorer
    downstream): score = sum over query terms of
    IDF(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), with
    IDF = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Determinism: every count (tf, df, dl, N) is an exact integer,
    avgdl is one bare division, and each TERM contribution is computed
    in one canonical expression order, rounded to 6dp and summed as
    DECIMAL — the _sub_l2 pattern — so a last-ulp ln() difference
    between libm and the JVM cannot reorder document ranks. Queries are
    literal strings (lowercased, whitespace-tokenized) embedded
    identically in the oracle.

    Scale shape: corpus is touched once (tokenize + per-doc tf counts);
    df and avgdl are vocabulary/corpus-bounded aggregates; scoring
    joins the tiny (query, term, df) table onto postings by term —
    per-term posting traffic only, never a corpus broadcast. Top-k per
    query is a rank-limited window (map-side WindowGroupLimit)."""
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [
            (q, t)
            for q in queries
            for t in dict.fromkeys(q.lower().split())  # dedupe, keep order
        ],
        "query string, term string",
    )
    agg = _bm25_scores(
        docs, qterms, "query", k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    return _topk_by_query(agg, "query", "bm25", k)


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack'09)
RRF_SOURCE_DEPTH = 20  # per-source candidate depth before fusion
# Hamming-shortlist depth for the default ANN semantic arm. 300 is the
# measured knee of the binary ladder (ANN_EVAL.md sf0.1: recall@10
# 0.64 @ shortlist 100 -> 0.86 @ 300) and, with depth=20 fused ranks on
# top, the fused list recovers ~all of the brute arm's hits (the
# hybrid_rrf_fused row in ANN_EVAL.md measures exactly this).
RRF_HAMMING_SHORTLIST = 300


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_stride: int = 100,
    k: int = 10,
    depth: int = RRF_SOURCE_DEPTH,
    rrf_k: int = RRF_K,
    semantic: str = "hamming",
    hamming_shortlist: int = RRF_HAMMING_SHORTLIST,
    lexical_prune: bool = False,
) -> DataFrame:
    """Hybrid more-like-this retrieval with reciprocal rank fusion
    (Cormack'09 RRF — the standard way production search combines a
    lexical and a vector ranker without score calibration): for each
    query DOCUMENT (every ``query_stride``-th id), rank the corpus by
    (a) BM25 over the query doc's own token set and (b) embedding
    cosine, take each source's top ``depth``, and fuse by
    rrf = sum over sources of 1/(rrf_k + rank). Ranks are integers and
    each contribution is one exact division, so the fused ordering is
    engine-deterministic without any rounding.

    ``semantic`` selects the vector arm's candidate source (VERDICT r5
    item 2 — the arm must not inherit a full-corpus exact scan):

    * ``"hamming"`` (default, the scale path) — binary sign codes +
      integer Hamming coarse scan shortlists ``hamming_shortlist``
      candidates per query (8-byte codes, XOR+popcount), then exact
      cosine reranks only the shortlist: exact-scan fraction is
      shortlist/N and FALLS as the corpus grows
      (similarity.binary_hamming_topk; recall ladder in ANN_EVAL.md).
    * ``"brute"`` — the O(nq*N) exact cosine scan. Kept as the
      oracle/eval arm: the fused-recall row in ANN_EVAL.md is measured
      against this variant. Do not use at scale.
    * a callable ``(qemb, embeddings, depth) -> DataFrame`` returning
      (q_id, doc_id, sem_rank) — plug in any ANN shortlist (e.g. a
      graph_ann_topk wrapper) without touching the fusion.

    ``lexical_prune`` applies the _bm25_scores max-score stop pruning
    (df/N >= 1/2 query terms skipped) to the lexical arm — the right
    default on a realistic Zipf vocabulary where stopword heads carry
    most of the posting traffic; OFF by default so the v1-corpus
    pinned results are unchanged.

    The embeddings table's vec_id is the documents table's doc_id (the
    testdata contract); the query doc itself is excluded from both
    sources. Scale shape: BM25 inherits the per-term posting traffic of
    bm25_topk, the default semantic arm scans only sign CODES at full
    corpus width, and fusion joins two (nq x depth) rank lists —
    negligible. Output: (q_id, doc_id, rrf, in_lexical, in_semantic,
    rnk)."""
    from pyspark.sql import Window

    qbase = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        F.col("doc_id"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    ).filter(F.length("term") > 0)
    qterms = (
        qbase.filter(F.col("doc_id") % query_stride == 0)
        .select(F.col("doc_id").alias("q_id"), "term")
        .distinct()
    )
    lex_scores = _bm25_scores(
        docs, qterms, "q_id", exclude_self=True, prune_high_df=lexical_prune
    )
    wl = Window.partitionBy("q_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        lex_scores.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= depth)
        .select("q_id", "doc_id", "lex_rank")
    )
    qemb = embeddings.filter(F.col("vec_id") % query_stride == 0)
    if callable(semantic):
        sem = semantic(qemb, embeddings, depth)
    elif semantic == "hamming":
        from worker_spark.operators.similarity import binary_hamming_topk

        # binary_hamming_topk already excludes self and ranks the
        # shortlist by (exact cos_sim desc, c_id asc) — the identical
        # ordering convention as the brute arm, so the two variants
        # differ ONLY in which candidates the shortlist reached
        sem = binary_hamming_topk(
            qemb, embeddings, k=depth, shortlist=hamming_shortlist
        ).select(
            "q_id",
            F.col("c_id").alias("doc_id"),
            F.col("rnk").alias("sem_rank"),
        )
    elif semantic == "brute":
        from worker_spark.operators.similarity import cosine_neighbors

        brute = cosine_neighbors(
            qemb, embeddings, threshold=-2.0, top_k=depth
        ).select(
            "q_id", F.col("c_id").alias("doc_id"), F.col("cos_sim")
        )
        ws = Window.partitionBy("q_id").orderBy(
            F.desc("cos_sim"), F.asc("doc_id")
        )
        sem = brute.withColumn(
            "sem_rank", F.row_number().over(ws)
        ).select("q_id", "doc_id", "sem_rank")
    else:
        raise ValueError(
            f"semantic must be 'hamming', 'brute' or a callable, "
            f"got {semantic!r}"
        )
    fused = lex.join(sem, ["q_id", "doc_id"], "full_outer").select(
        "q_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
        F.col("lex_rank").isNotNull().alias("in_lexical"),
        F.col("sem_rank").isNotNull().alias("in_semantic"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id", "doc_id", "rrf", "in_lexical", "in_semantic",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
