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
            F.concat(
                F.lit("zz"),
                F.substring(
                    F.md5(F.concat(seed, F.lit(":"), i.cast("string"))), 1, 6
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


def evaluate_dedup(
    spark: SparkSession,
    sf_dir: str,
    plant_stride: int = PLANT_STRIDE,
    shingle_df_cap: int = 1000,
    include_edit_distance: bool = False,
) -> list[dict]:
    """Run every dedup method over the planted corpus; one result dict
    per method: name, cand_pairs, found_total, found_planted,
    planted_precision, and recall_t{rate} per tier.

    include_edit_distance gates the banded edit-distance method (its
    per-pair DP cost is the highest of the family — fine at sf0.01,
    several minutes at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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

    rows = []
    for name, found_df, cand_df in methods:
        # the dedup pipelines cache their shingle/signature/fingerprint
        # intermediates and never unpersist (dedup.py module docstring:
        # callers running many pipelines in one session must clear);
        # without this, four methods' intermediates stay pinned
        # simultaneously. corpus/truth re-cache lazily on next use.
        spark.catalog.clearCache()
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
        found.unpersist()
        hits.unpersist()
    corpus.unpersist()
    truth.unpersist()
    return rows


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
