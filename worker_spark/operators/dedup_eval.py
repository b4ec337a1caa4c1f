"""Dedup-family recall-vs-cost evaluation harness (sibling of
operators/ann_eval.py, extending the VERDICT r4 "evidence a user needs
to choose" idea from the ANN family to the near-dup family).

The dedup family (operators/dedup.py) implements five textual near-dup
strategies with different cost/recall envelopes. This module produces
the evidence needed to CHOOSE one: plant KNOWN near-duplicates at
controlled perturbation levels into the real documents corpus, then
measure, per method:

* recall per perturbation tier — the fraction of planted pairs found;
* candidate volume — pairs the method examines AT ALL (the scale cost:
  every candidate pays at least a join row, verified candidates pay an
  exact-similarity computation);
* planted precision — found pairs that are planted pairs. NOTE: the
  synthetic corpus has a 31-token vocabulary, so ORGANIC near-dups
  exist (especially short documents); a low planted-precision number
  means "found organic pairs too", not "found garbage". The per-method
  verification guarantee (exact Jaccard >= threshold, hamming <= max)
  still holds for every emitted pair.

Planting is fully deterministic (hash-driven, no RNG): every
``plant_stride``-th document gets one perturbed copy whose id is
``orig_id + PLANT_OFFSET``. Perturbation replaces each token position t
with a unique out-of-vocabulary token iff
``xxhash64(orig_id || ':' || t) % 100 < rate``; the rate comes from the
document's tier = (doc_id / plant_stride) % len(TIERS). Replacement
(not deletion) keeps token counts stable so expected shingle survival
is exactly (1 - rate)^n for word-n-grams — tier design maps to an
expected true Jaccard of s/(2-s), s = (1-rate)^3:

    tier rate  E[survival]  E[jaccard]
    0    0%    1.000        1.000  (byte-identical copy)
    1    5%    0.857        0.750  (above the 4x4 LSH s-curve midpoint)
    2    15%   0.614        0.443  (below minhash tau=0.5, above ngram
                                    tau=0.2 — separates the two)
    3    25%   0.422        0.267  (only the ngram threshold reaches it)

Candidate counts mirror each pipeline's internal candidate stage the
same way ann_eval mirrors the ANN operators (the harness must count
what the operator examines without instrumenting it):

* minhash  — lsh_candidate_pairs over minhash_signatures
  (dedup.py minhash_lsh_dedup_pairs)
* simhash  — band-equality distinct pairs BEFORE the hamming filter
  (dedup.py simhash_near_dup_pairs)
* ngram    — distinct pairs sharing >= 1 capped shingle
  (dedup.py _jaccard_verify candidate join)
* exact    — the hash equi-join only ever pairs true duplicates, so
  candidates == found.

Used by tools/dedup_eval.py (markdown tables, committed as
DEDUP_EVAL.md) and tests/test_dedup_eval.py (asserted floors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import dedup as D
from worker_spark.sources import load_table

PLANT_OFFSET = 10_000_000
TIERS = (0, 5, 15, 25)  # token replacement percent per tier
PLANT_STRIDE = 5


def _tier_col(id_col: F.Column, plant_stride: int) -> F.Column:
    return F.pmod((id_col / plant_stride).cast("long"), F.lit(len(TIERS)))


def _rate_col(tier: F.Column) -> F.Column:
    rates = F.array(*[F.lit(r) for r in TIERS])
    return F.element_at(rates, (tier + 1).cast("int"))


def planted_corpus(
    docs: DataFrame, plant_stride: int = PLANT_STRIDE
) -> DataFrame:
    """Originals plus one perturbed copy (id + PLANT_OFFSET) of every
    plant_stride-th document. Deterministic token replacement at the
    document's tier rate; replacement tokens are unique OOV strings so
    a replaced position can never accidentally re-match."""
    base = docs.select("doc_id", "text")
    victims = base.filter(F.col("doc_id") % plant_stride == 0)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    rate = _rate_col(_tier_col(F.col("doc_id"), plant_stride))
    seed = F.concat_ws(":", F.col("doc_id").cast("string"))
    perturbed = F.transform(
        toks,
        lambda t, i: F.when(
            F.pmod(
                F.xxhash64(F.concat(seed, F.lit(":"), i.cast("string"))),
                F.lit(100),
            )
            < rate,
            # replacement token = "zz" + doc_id verbatim + 8 md5 hex
            # chars: the doc_id component makes cross-document collisions
            # impossible BY CONSTRUCTION (ADVICE r5: the old 24-bit
            # suffix was birthday-bounded across ~10^3 plants x tokens),
            # and the 32-bit position hash keeps within-document
            # replacements distinct in practice
            F.concat(
                F.lit("zz"),
                F.col("doc_id").cast("string"),
                F.lit("x"),
                F.substring(
                    F.md5(F.concat(seed, F.lit(":"), i.cast("string"))), 1, 8
                ),
            ),
        ).otherwise(t),
    )
    # tier-0 copies reuse the ORIGINAL text verbatim: rebuilding it via
    # concat_ws(split(...)) normalizes whitespace, so a document with a
    # double space or newline would get a NOT-byte-identical "identical"
    # copy and break exact recall_t0 == 1.0 (review finding). Higher
    # tiers go through the token rebuild, whose whitespace
    # normalization is part of the perturbation.
    dups = victims.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.when(rate == 0, F.col("text"))
        .otherwise(F.concat_ws(" ", perturbed))
        .alias("text"),
    )
    return base.unionByName(dups)


def truth_pairs(
    docs: DataFrame, plant_stride: int = PLANT_STRIDE
) -> DataFrame:
    """(id_a, id_b, tier) for every planted pair, id_a < id_b."""
    return docs.filter(F.col("doc_id") % plant_stride == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + PLANT_OFFSET).alias("id_b"),
        _tier_col(F.col("doc_id"), plant_stride).alias("tier"),
    )


def _exact_pairs(corpus: DataFrame) -> DataFrame:
    """Byte-identical duplicate pairs via text-hash equi-join (the
    pair view of dedup.exact_dedup's hash groups)."""
    h = corpus.select("doc_id", F.md5(F.col("text")).alias("h"))
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def _ngram_candidates(corpus: DataFrame, shingle_df_cap: int) -> DataFrame:
    """Distinct pairs sharing >= 1 capped shingle — mirrors the
    candidate equi-join inside dedup._jaccard_verify / the df-cap
    filter in dedup.ngram_jaccard_pairs."""
    sh = D.word_shingles(corpus)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > shingle_df_cap)
        .select("shingle")
    )
    sh = sh.join(hot, "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _simhash_candidates(corpus: DataFrame) -> DataFrame:
    """Band-bucket collision pairs BEFORE the hamming filter — mirrors
    the banded self-join inside dedup.simhash_near_dup_pairs."""
    fps = D.simhash(corpus)
    entries = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col("simhash"), D.SIMHASH_BAND_BITS * k)
                .bitwiseAND(F.lit(D.SIMHASH_BAND_MASK))
                .alias("byte"),
            )
            for k in range(4)
        ]
    )
    banded = fps.select("id", F.explode(entries).alias("e")).select(
        "id", F.col("e.band").alias("band"), F.col("e.byte").alias("byte")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _lsh_candidates(corpus: DataFrame) -> DataFrame:
    sigs = D.minhash_signatures(corpus)
    return D.lsh_candidate_pairs(sigs).select("id_a", "id_b").distinct()


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every currently-persisted RDD (the JVM-side registry that
    backs DataFrame .cache())."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _unpersist_added_since(spark: SparkSession, before: set[int]) -> None:
    """Unpersist exactly the RDDs cached since ``before`` was snapshot.
    The dedup pipelines cache shingle/signature intermediates internally
    and hand back no handles; this releases THEIR entries after each
    method without the session-global clearCache the r5 ADVICE flagged
    (which also evicted the harness's own corpus/truth caches — removed
    CacheManager entries do NOT re-cache on next use)."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() not in before:
            t._2().unpersist(False)


def evaluate_dedup(
    spark: SparkSession,
    sf_dir: str,
    plant_stride: int = PLANT_STRIDE,
    shingle_df_cap: int = 1000,
    include_edit_distance: bool = False,
    corpus_source: str = "documents",
) -> list[dict]:
    """Run every dedup method over the planted corpus; one result dict
    per method: name, cand_pairs, found_total, found_planted,
    planted_precision, and recall_t{rate} per tier.

    include_edit_distance gates the banded edit-distance method (its
    per-pair DP cost is the highest of the family — fine at sf0.01,
    several minutes at sf0.1).

    corpus_source: "documents" (the raw fixture — its ~31-token
    vocabulary makes unplanted documents legitimately shingle-similar,
    so planted_precision reads low for reasons that are the CORPUS's,
    not the method's) or "documents_v2" (the Zipf-ish derived corpus,
    sources/synth_corpus.py — realistic organic-collision rates; the
    corpus the headline precision/recall claims should be read from,
    VERDICT r7 item 3)."""
    if corpus_source == "documents_v2":
        from worker_spark.sources.synth_corpus import documents_v2

        docs = documents_v2(spark, sf_dir)
    elif corpus_source == "documents":
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
    else:
        raise ValueError(f"unknown corpus_source: {corpus_source!r}")
    corpus = planted_corpus(docs, plant_stride).cache()
    corpus.count()
    # NOTE: the _lsh/_simhash/_ngram candidate counters rebuild the
    # method's shingle/signature stage a second time by design — the
    # harness mirrors operator internals without instrumenting them
    # (same policy as ann_eval; docstrings cite the mirrored lines).
    truth = truth_pairs(docs, plant_stride).cache()
    per_tier = {
        int(r["tier"]): int(r["n"])
        for r in truth.groupBy("tier").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    methods: list[tuple[str, DataFrame, DataFrame]] = [
        ("exact", _exact_pairs(corpus), None),
        (
            "minhash_lsh(tau=0.5)",
            D.minhash_lsh_dedup_pairs(corpus, threshold=0.5),
            _lsh_candidates(corpus),
        ),
        (
            "simhash(ham<=3)",
            D.simhash_near_dup_pairs(corpus, max_hamming=3),
            _simhash_candidates(corpus),
        ),
        (
            "ngram_jaccard(tau=0.2)",
            D.ngram_jaccard_pairs(
                corpus, threshold=0.2, shingle_df_cap=shingle_df_cap
            ),
            _ngram_candidates(corpus, shingle_df_cap),
        ),
    ]
    if include_edit_distance:
        methods.append(
            (
                "edit_distance(25%)",
                D.edit_distance_near_dups(corpus),
                None,
            )
        )

    # snapshot AFTER corpus/truth are pinned: everything cached beyond
    # this point belongs to a method run and is released after it
    base_cached = _persistent_rdd_ids(spark)
    rows = []
    for name, found_df, cand_df in methods:
        found = found_df.select("id_a", "id_b").distinct().cache()
        found_total = found.count()
        cand_pairs = found_total if cand_df is None else cand_df.count()
        hits = truth.join(found, ["id_a", "id_b"]).cache()
        found_planted = hits.count()
        hit_tiers = {
            int(r["tier"]): int(r["n"])
            for r in hits.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        row = {
            "method": name,
            "cand_pairs": cand_pairs,
            "found_total": found_total,
            "found_planted": found_planted,
            "planted_precision": round(found_planted / found_total, 4)
            if found_total
            else None,
        }
        for tier, rate in enumerate(TIERS):
            denom = per_tier.get(tier, 0)
            row[f"recall_t{rate}"] = (
                round(hit_tiers.get(tier, 0) / denom, 4) if denom else None
            )
        rows.append(row)
        # releases found/hits AND the method pipeline's internal caches
        # (dedup.py pipelines cache shingle/signature intermediates and
        # hand back no handles), leaving corpus/truth pinned
        _unpersist_added_since(spark, base_cached)
    corpus.unpersist()
    truth.unpersist()
    return rows


# --- semantic (embedding-space) planting -------------------------------
#
# VERDICT r5 item 4: the lexical tiers above cannot exercise the
# EMBEDDING dedup family (semdedup, label-blocked cosine) — a token
# replacement does not move a precomputed vector. Paraphrase-tier
# near-dups are planted directly in embedding space instead: every
# plant_stride-th vector gets one deterministically perturbed copy,
# v'_i = v_i + c * rms(v) * u_i with u_i a hash-driven uniform in
# [-1, 1] (no RNG), where the noise multiple c comes from the vector's
# tier. Expected cosine for unit-RMS noise is 1/sqrt(1 + c^2/3);
# measured on the sf0.01 corpus (unit-norm vectors):
#
#     tier c    E[cos]   role
#     0    0.0  1.000    identical copy — every method's sanity row
#     1    0.5  ~0.96    close paraphrase — above both taus
#     2    2.0  ~0.67    loose paraphrase — above tau, but far enough
#                        to hop IVF cells (blocking recall separates
#                        semdedup from label-blocking here)
#     3    6.0  ~0.29    unrelated rewrite — below both taus (0.3/0.35):
#                        a verified miss for every method
#
# The copy keeps the original's label (a paraphrase keeps its topic),
# so the label-blocked method's recall isolates the VERIFY threshold
# while semdedup's recall compounds cell-blocking — the semantic analog
# of the minhash-vs-ngram candidate-stage split in the lexical tables.

EMB_TIERS = (0.0, 0.5, 2.0, 6.0)  # noise amplitude, multiples of rms(v)


def planted_embeddings(
    emb: DataFrame, plant_stride: int = PLANT_STRIDE
) -> DataFrame:
    """Originals plus one perturbed copy (vec_id + PLANT_OFFSET) of
    every plant_stride-th vector, noise level set by the vector's tier.
    Fully deterministic: u_i = (xxhash64(vec_id ':' i) mod 2001 - 1000)
    / 1000. Tier-0 copies reuse the original array verbatim (the same
    byte-identity guarantee as the lexical tier-0 plants)."""
    base = emb.select("vec_id", "embedding", "label")
    victims = base.filter(F.col("vec_id") % plant_stride == 0)
    tier = _tier_col(F.col("vec_id"), plant_stride)
    amps = F.array(*[F.lit(float(c)) for c in EMB_TIERS])
    amp = F.element_at(amps, (tier + 1).cast("int"))
    dim = F.size(F.col("embedding"))
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    rms = F.sqrt(sq / dim.cast("double"))
    seed = F.col("vec_id").cast("string")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + amp
            * rms
            * (
                (
                    F.pmod(
                        F.xxhash64(
                            F.concat(seed, F.lit(":"), i.cast("string"))
                        ),
                        F.lit(2001),
                    )
                    - F.lit(1000)
                ).cast("double")
                / F.lit(1000.0)
            )
        ).cast("float"),
    )
    dups = victims.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.when(amp == 0.0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
    )
    return base.unionByName(dups)


def emb_truth_pairs(
    emb: DataFrame, plant_stride: int = PLANT_STRIDE
) -> DataFrame:
    """(id_a, id_b, tier) for every planted embedding pair."""
    return emb.filter(F.col("vec_id") % plant_stride == 0).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + PLANT_OFFSET).alias("id_b"),
        _tier_col(F.col("vec_id"), plant_stride).alias("tier"),
    )


def evaluate_semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    plant_stride: int = PLANT_STRIDE,
    semdedup_tau: float = None,
    blocked_tau: float = 0.3,
) -> list[dict]:
    """Semantic-dedup rows with the same recall/cost columns as
    evaluate_dedup, over the embedding-planted corpus: one row for
    semdedup (IVF-cell blocking + cosine verify, similarity.py
    semantic_dedup — found pairs are its (dup_of, vec_id) min-offender
    view) and one for label-blocked cosine pairs
    (similarity.embedding_blocked_pairs — the exact operator behind the
    dedup_embedding_blocked query). Candidate mirrors count each
    method's within-block pair stage, the ann_eval/evaluate_dedup
    policy."""
    from worker_spark.operators import similarity as S

    if semdedup_tau is None:
        semdedup_tau = S.SEMDEDUP_TAU
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    corpus = planted_embeddings(emb, plant_stride).cache()
    corpus.count()
    truth = emb_truth_pairs(emb, plant_stride).cache()
    per_tier = {
        int(r["tier"]): int(r["n"])
        for r in truth.groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # candidate mirrors: within-cell pairs (semdedup's pair stage) and
    # within-label pairs (the blocked join), both id_a < id_b
    centroids = corpus.filter(F.col("vec_id") % S.SEMDEDUP_CENTROID_EVERY == 0)
    cells = S.ivf_assign(corpus, centroids).select("vec_id", "cell_id")
    ca, cb = cells.alias("a"), cells.alias("b")
    cell_cand = (
        ca.join(
            cb,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id"), F.col("b.vec_id"))
        .count()
    )
    lab = corpus.select("vec_id", "label")
    la, lb = lab.alias("a"), lab.alias("b")
    label_cand = (
        la.join(
            lb,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id"), F.col("b.vec_id"))
        .count()
    )

    # Two recall units, BOTH first-class columns (VERDICT r7 item 7):
    #
    # * pair_c{c} — pair attribution: the found (id_a, id_b) must be
    #   exactly the planted (original, copy) pair;
    # * drop_c{c} — "planted copy dropped": the copy id appears as the
    #   duplicate side of ANY found pair / pruned vector.
    #
    # For a pair LISTER the two mostly agree. For a PRUNER (semdedup)
    # they measure different things: its dup_of is the MIN offending
    # lower id, and at tau=0.35 an ORGANIC >= tau cell-mate with an id
    # smaller than the planted original frequently wins that min —
    # pair attribution then counts a genuinely pruned duplicate as a
    # miss (measured at sf0.1: tier-0 pair 0.66 vs drop 1.0,
    # DEDUP_EVAL.md). The drop
    # column is the pruner's honest effectiveness number; the pair
    # column shows how often the attribution landed on the planted
    # source. found_total / planted_precision stay in each method's
    # primary unit (pruner: dropped vectors; lister: pairs).
    sem_out = S.semantic_dedup(
        corpus, centroid_every=S.SEMDEDUP_CENTROID_EVERY, tau=semdedup_tau
    )
    sem_pairs = sem_out.filter(~F.col("kept")).select(
        F.col("dup_of").alias("id_a"), F.col("vec_id").alias("id_b")
    )
    blk_pairs = S.embedding_blocked_pairs(
        corpus, tau=blocked_tau, block_col="label"
    ).select("id_a", "id_b")

    base_cached = _persistent_rdd_ids(spark)
    rows = []
    for name, pairs_df, primary_unit, cand_pairs in (
        (f"semdedup(tau={semdedup_tau})", sem_pairs, "drop", cell_cand),
        (
            f"embedding_blocked(tau={blocked_tau})",
            blk_pairs,
            "pair",
            label_cand,
        ),
    ):
        pairs = pairs_df.distinct().cache()
        drops = pairs.select("id_b").distinct().cache()
        pair_hits = truth.join(pairs, ["id_a", "id_b"])
        drop_hits = truth.join(drops, ["id_b"])
        pair_tiers = {
            int(r["tier"]): int(r["n"])
            for r in pair_hits.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        drop_tiers = {
            int(r["tier"]): int(r["n"])
            for r in drop_hits.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if primary_unit == "drop":
            found_total = drops.count()
            found_planted = sum(drop_tiers.values())
        else:
            found_total = pairs.count()
            found_planted = sum(pair_tiers.values())
        row = {
            "method": name,
            "cand_pairs": cand_pairs,
            "found_total": found_total,
            "found_planted": found_planted,
            "planted_precision": round(found_planted / found_total, 4)
            if found_total
            else None,
        }
        for tier, c in enumerate(EMB_TIERS):
            denom = per_tier.get(tier, 0)
            row[f"pair_c{c}"] = (
                round(pair_tiers.get(tier, 0) / denom, 4) if denom else None
            )
            row[f"drop_c{c}"] = (
                round(drop_tiers.get(tier, 0) / denom, 4) if denom else None
            )
        rows.append(row)
        _unpersist_added_since(spark, base_cached)
    corpus.unpersist()
    truth.unpersist()
    return rows


def markdown_semantic_table(rows: list[dict]) -> str:
    cols = [
        "method",
        *[f"pair_c{c}" for c in EMB_TIERS],
        *[f"drop_c{c}" for c in EMB_TIERS],
        "cand_pairs",
        "found_total",
        "found_planted",
        "planted_precision",
    ]
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append(
            "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |"
        )
    return "\n".join(out)


def markdown_table(rows: list[dict]) -> str:
    cols = [
        "method",
        *[f"recall_t{r}" for r in TIERS],
        "cand_pairs",
        "found_total",
        "found_planted",
        "planted_precision",
    ]
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append(
            "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |"
        )
    return "\n".join(out)
