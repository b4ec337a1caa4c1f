"""Deterministic stratified sampling / data-mixture weighting.

Training corpora are mixed from heterogeneous sources with per-stratum
rates (downsample the over-represented web crawl, keep all of the rare
high-quality stratum). Sampling must be DETERMINISTIC — re-running the
pipeline (or running it on different cluster layouts) must select the same
documents — so the keep/drop decision hashes the document id, never
``rand()`` (LLM-data-pipeline extension; no reference counterpart file).

Mechanism: bucket = first 8 hex chars of md5(id) as an integer, mod
``DENOM``; keep the row when bucket < rate * DENOM. md5 is engine-portable
(identical in DuckDB, Spark, Postgres), making the sample oracle-checkable
and reproducible anywhere.

Scale notes (100 TB):
* The filter is a pure map-side predicate on projected columns — no
  shuffle, no UDF; it pushes into the scan stage and composes with column
  pruning (only id + stratum columns are read when the caller projects).
* Per-stratum rate lookup compiles to a CASE chain (a broadcast join would
  also work for thousands of strata; a literal CASE beats it for the
  typical handful).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 10_000


def strat_bucket(id_col: Column) -> Column:
    """Deterministic hash bucket in [0, DENOM): engine-portable md5 prefix."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % DENOM
    )


def _rate_col(strat: Column, rates: dict[str, float], default_rate: float) -> Column:
    expr = F.lit(float(default_rate))
    for key, rate in sorted(rates.items()):
        expr = F.when(strat == key, F.lit(float(rate))).otherwise(expr)
    return expr


def threshold_for(rate: float) -> int:
    """Integer keep-threshold for a rate: host-side rounding so the cutoff
    is an exact literal in every engine (a double product truncated with
    ``cast(long)`` can land one bucket off DuckDB's DECIMAL rounding)."""
    return int(round(float(rate) * DENOM))


def _threshold_col(
    strat: Column, rates: dict[str, float], default_rate: float
) -> Column:
    expr = F.lit(threshold_for(default_rate))
    for key, rate in sorted(rates.items()):
        expr = F.when(strat == key, F.lit(threshold_for(rate))).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    id_col: str,
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row iff its id-hash bucket clears the stratum's rate.
    Adds ``strat_bucket`` so the decision is auditable downstream."""
    bucket = strat_bucket(F.col(id_col))
    threshold = _threshold_col(F.col(strat_col), rates, default_rate)
    return df.withColumn("strat_bucket", bucket).filter(bucket < threshold)


def mixture_report(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    id_col: str,
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum mixture audit: total rows, sampled rows, target vs
    achieved rate (single aggregation pass; conditional count on the same
    bucket predicate the sampler applies)."""
    bucket = strat_bucket(F.col(id_col))
    rate = _rate_col(F.col(strat_col), rates, default_rate)
    threshold = _threshold_col(F.col(strat_col), rates, default_rate)
    kept = (bucket < threshold).cast("long")
    return (
        df.groupBy(F.col(strat_col).alias("stratum"))
        .agg(
            F.count("*").alias("total_rows"),
            F.sum(kept).alias("sampled_rows"),
            F.round(F.max(rate), 6).alias("target_rate"),
            F.round(F.sum(kept) / F.count("*"), 6).alias("achieved_rate"),
        )
    )


def quota_sample(
    df: DataFrame, k: int, strat_col: str, id_col: str
) -> DataFrame:
    """Exact-k deterministic sample per stratum: rank rows by (hash bucket,
    id) within each stratum and keep the first ``k``. Unlike rate-based
    sampling this hits the quota exactly, at the cost of one shuffle keyed
    on the stratum.

    Skew note (100 TB): a mega-stratum funnels into one reducer for its
    window. When stratum sizes are known ahead, pre-filter with
    ``strat_bucket < (k / est_rows) * DENOM * safety`` so the window only
    ranks a thin candidate slice — same result, bounded reducer input."""
    from pyspark.sql import Window

    bucket = strat_bucket(F.col(id_col))
    w = Window.partitionBy(strat_col).orderBy("strat_bucket", id_col)
    return (
        df.withColumn("strat_bucket", bucket)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


SPLIT_DENOM = 10_000


def split_assign(
    df: DataFrame,
    id_col: str,
    train_per_myriad: int = 9_800,
    val_per_myriad: int = 9_900,
    n_shards: int = 8,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic train/val/test assignment + output-shard routing +
    global shuffle key — the last mile of every training-data pipeline.

    Three INDEPENDENT decisions, each from a disjoint slice of one
    md5(id:salt) digest (slices of a cryptographic hash are independent,
    so split membership never correlates with shard placement or shuffle
    order):
    * hex[1..8]  -> split bucket in [0, 10000): train < ``train_per_myriad``
      <= val < ``val_per_myriad`` <= test (holdout fractions are exact
      myriad integers — no float thresholds);
    * hex[9..16] -> shard = bucket2 % ``n_shards`` (which output file the
      row lands in — balanced routing that is stable under reruns and
      cluster layout, unlike ``rand()`` or round-robin);
    * hex[17..24]-> shuffle_key: ordering by it is a deterministic global
      shuffle (training wants documents decorrelated from source order;
      sorting by a hash of the id is reproducible shuffling).

    Map-only: one digest + three substrings per row, no shuffle, no UDF;
    at 100 TB the sort-by-shuffle_key is the single intentional exchange
    and it is exactly the write-time ``repartitionByRange`` the sink
    needs anyway. Changing ``salt`` re-deals every assignment atomically.
    """
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    b_split = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % SPLIT_DENOM
    )
    b_shard = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    return df.withColumns(
        {
            "split_bucket": b_split,
            "split": F.when(b_split < train_per_myriad, F.lit("train"))
            .when(b_split < val_per_myriad, F.lit("val"))
            .otherwise(F.lit("test")),
            "shard": (b_shard % n_shards).cast("int"),
            "shuffle_key": F.substring(digest, 17, 8),
        }
    )


# Dyadic fixed-point scale for temperature weights: floor(sqrt(x) * 2^20)
# is exact in IEEE 754 (sqrt is correctly rounded by the standard), so
# both engines quantize to the SAME integer and the normalized weights
# hash-check bit-for-bit.
MIX_Q = 1 << 20


def _stratum_wq(
    df: DataFrame, strat_col: str, weight_col: str | None = None
) -> DataFrame:
    """The temperature-mixture integer weight per stratum — the SINGLE
    definition of the quantization rule (floor(sqrt(share) * 2^20)),
    shared by mixture_weights and mixture_interleave so the realized
    interleave can never drift from the declared mixture. Output:
    (stratum, stratum_rows, total_rows, w_q) with w_q >= 1: a stratum
    with share < 2^-40 would quantize to 0 and a zero divisor diverges
    across engines (NULL-first Spark asc sort vs NULL-last DuckDB — the
    same hazard weighted_priority_sample guards), so the floor is
    clamped to 1 in both engines."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    per = df.groupBy(F.col(strat_col).alias("stratum")).agg(
        F.sum(w.cast("long")).alias("stratum_rows")
    )
    tot = per.agg(F.sum("stratum_rows").alias("total_rows"))
    return per.crossJoin(F.broadcast(tot)).withColumn(
        "w_q",
        F.greatest(
            F.floor(
                F.sqrt(
                    F.col("stratum_rows").cast("double")
                    / F.col("total_rows").cast("double")
                )
                * F.lit(MIX_Q)
            ).cast("long"),
            F.lit(1).cast("long"),
        ),
    )


def mixture_weights(
    df: DataFrame, strat_col: str, weight_col: str | None = None
) -> DataFrame:
    """Temperature-scaled mixture weights per source stratum (alpha = 0.5,
    i.e. sqrt scaling — the multilingual/mixture-rebalancing rule of
    mBERT/XLM-R and data-mixture tuning: raising rare strata, damping the
    dominant crawl; generalize by replacing sqrt with pow(share, alpha)).

    share_s   = rows_s / total_rows                  (exact int ratio)
    w_q       = floor(sqrt(share_s) * 2^20)          (exact integer)
    weight_s  = w_q / sum(w_q)                       (rounded 6dp)
    epochs_s  = weight_s * total / rows_s            (duplication factor
                a sampler must apply to realize the mixture; rounded 6dp)

    One groupBy onto |strata| keys, then the totals ride back as a
    broadcast 1-row aggregate — nothing here scales with corpus size
    except the first partial aggregation, which is map-side combined.
    ``weight_col`` optionally weights rows (e.g. by token count) instead
    of counting them.
    """
    q = _stratum_wq(df, strat_col, weight_col)
    qtot = q.agg(F.sum("w_q").alias("w_q_total"))
    return (
        q.crossJoin(F.broadcast(qtot))
        .select(
            "stratum",
            "stratum_rows",
            F.round(
                F.col("stratum_rows").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.col("w_q").cast("double") / F.col("w_q_total").cast("double"), 6
            ).alias("mix_weight"),
            F.round(
                (F.col("w_q").cast("double") / F.col("w_q_total").cast("double"))
                * F.col("total_rows").cast("double")
                / F.col("stratum_rows").cast("double"),
                6,
            ).alias("epochs"),
        )
    )


WEIGHTED_SAMPLE_K = 50


def weighted_priority_sample(
    docs: DataFrame,
    k: int = WEIGHTED_SAMPLE_K,
    id_col: str = "doc_id",
    weight_col: Column | None = None,
) -> DataFrame:
    """Weighted sample without replacement via PRIORITY SAMPLING
    (Duffield, Lund, Thorup, JACM 2007): each item gets priority
    q = w * 2^32 / h with h a uniform md5-prefix integer of its id; the
    k highest priorities form the sample, and inclusion probability is
    proportional to weight (ppswor in the large-k limit).

    Engine-exactness: w and h are exact integers, so q is one double
    division over exact inputs — bit-identical in both engines — and
    ties break on the id. The divisor is ``h + 1`` (range [1, 2^32]):
    the raw 32-bit hash prefix is 0 with p = 2^-32 per doc, and a zero
    divisor diverges across engines (NULL-drop non-ANSI Spark, error
    under ANSI, +inf in DuckDB); the +1 shift keeps the priority total
    and bit-identical everywhere at no statistical cost.
    Deterministic (id-hashed), reproducible, and
    mergeable at scale: top-k by priority is a partial-aggregatable
    TopK (each partition keeps its local k, the reducer keeps the
    global k) — no full sort at 100 TB.

    Output: (doc_id, weight, priority) for the k sampled items.
    """
    w = (
        weight_col
        if weight_col is not None
        else F.length(F.col("text")).cast("long")
    )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        (
            (w * F.lit(4294967296.0)) / (h + F.lit(1)).cast("double")
        ).alias("_q"),
    )
    # orderBy + limit compiles to TakeOrderedAndProject: each partition
    # keeps a local top-k, the driver merges — the mergeable TopK shape,
    # never a global sort (a row_number window would single-partition)
    return (
        scored.orderBy(F.desc("_q"), F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            "weight",
            F.round("_q", 4).alias("priority"),
        )
    )


# A-ES weighted reservoir constants: u = (h+1)/2^32 with h the 32-bit
# md5 prefix, so ln(u) = ln(h+1) - 32*ln(2). Both terms are quantized to
# integer MICROS (the LM_MICRO trick) so the A-ES key is ONE division of
# exact integers — bit-identical across engines. round(32*ln(2)*1e6):
AES_LN_2POW32_MICROS = 22_180_710
AES_MICRO = 1_000_000


def weighted_reservoir_sample(
    docs: DataFrame,
    k: int = WEIGHTED_SAMPLE_K,
    id_col: str = "doc_id",
    weight_col: Column | None = None,
) -> DataFrame:
    """Weighted sampling without replacement via the EXPONENTIAL-rank
    reservoir (A-ES, Efraimidis & Spirakis, IPL 2006): each item draws
    u ~ U(0,1] and ranks by u^(1/w); the k largest ranks are an exact
    ppswor sample. The classic streaming formulation keeps a k-item
    heap; here the rank is a pure per-row expression and the top-k is
    Spark's mergeable distributed TakeOrdered — the same sample, no
    sequential pass (each partition keeps a local k, the reducer keeps
    the global k), so it holds at any corpus size.

    Engine-exactness (the integer reformulation of the pow-rank):
    ranking by u^(1/w) is order-equivalent to ranking by ln(u)/w. With
    u = (h+1)/2^32 for the exact 32-bit md5-prefix integer h, ln(u) =
    ln(h+1) - 32*ln(2); both terms are quantized to integer MICROS
    (text.LM_MICRO precedent), making the key ONE double division of
    exact integers — bit-identical in Spark and DuckDB, no pow() and no
    raw libm value ever compared. The micro-quantization discretizes
    the exponential at 1e-6 nats — far below any sampling-relevant
    scale — and ties (same quantized key) break on the id.

    Complements weighted_priority_sample (Duffield'07): priority
    sampling optimizes subset-sum ESTIMATION variance, A-ES draws the
    exact sequential-ppswor distribution — the pair gives both
    standard weighted-sampling semantics behind one call shape.

    A-ES is defined for w > 0 only; rows with weight <= 0 are FILTERED
    before ranking (round-9 advice). A zero weight divides ln(u) by
    zero — NULL in Spark but ±inf/NaN in a double-division oracle, a
    latent engine divergence — and the ppswor limit of w -> 0 is zero
    inclusion probability anyway, so the filter IS the semantics; a
    negative weight has no defined rank at all and is dropped by the
    same predicate rather than silently inverting the order.

    Output: (doc_id, weight, aes_key_micros) for the k sampled items,
    aes_key_micros = the integer-micros numerator ln(u)*1e6 (exact);
    the ranking divides it by the integer weight.
    """
    scored = aes_scored(docs, id_col=id_col, weight_col=weight_col)
    return (
        scored.orderBy(F.desc("_r"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "weight", "aes_key_micros")
    )


def aes_scored(
    docs: DataFrame,
    id_col: str = "doc_id",
    weight_col: Column | None = None,
) -> DataFrame:
    """(doc_id, weight, aes_key_micros, _r): every document's exact
    A-ES rank ingredients — the ONE definition of the integer-micros
    key shared by the batch reservoir and the streaming reservoir
    (streaming/reservoir.py), so the two cannot drift. Rows with
    weight <= 0 are filtered here (the w > 0 precondition both
    consumers rely on)."""
    w = (
        weight_col
        if weight_col is not None
        else F.length(F.col("text")).cast("long")
    )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    ln_u_micros = (
        F.round(F.log(h.cast("double") + F.lit(1.0)) * F.lit(AES_MICRO))
        .cast("long")
        - F.lit(AES_LN_2POW32_MICROS)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        ln_u_micros.alias("aes_key_micros"),
        # ln(u)/w: negative numerator over positive weight — larger
        # (closer to zero) wins, exactly u^(1/w) descending
        (
            ln_u_micros.cast("double") / w.cast("double")
        ).alias("_r"),
    ).filter(F.col("weight") > 0)


INTERLEAVE_TOP_N = 200


def mixture_interleave(
    df: DataFrame,
    strat_col: str,
    top_n: int = INTERLEAVE_TOP_N,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture-weighted TRAINING ORDER via stride
    scheduling (Waldspurger & Weihl, OSDI '95 — the classic
    proportional-share interleave): the k-th document of stratum s is
    consumed at virtual time (2k+1) / w_s, so any prefix of the global
    order contains each stratum in proportion to its weight (within one
    document — the stride-scheduling lag bound). Weights are the
    temperature-mixture integers of ``mixture_weights`` (w_q =
    floor(sqrt(share) * 2^20) — exact in both engines); within a
    stratum documents are pseudo-shuffled by md5 then consumed in that
    fixed order, so the whole schedule is reproducible bit-for-bit.

    This is the LAST step of a training-data pipeline: the order
    samples are actually fed to the trainer. Emitting the first
    ``top_n`` positions is a distributed TakeOrdered (per-partition
    local top-n, merged on the driver — never a global sort); a full
    shard-writing run would range-sort on vtime instead, which Spark
    distributes.

    Output: (doc_id, stratum, k, vtime) for the first ``top_n``
    positions, ordered. vtime = (2k+1)/w_q is one IEEE division of
    exact integers — identical in both engines — rounded 10dp for the
    hash surface; ties break (stratum, doc_id)."""
    wq = _stratum_wq(df, strat_col).select("stratum", "w_q")
    from pyspark.sql import Window

    order_w = Window.partitionBy(F.col(strat_col)).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(strat_col).alias("stratum"),
        (F.row_number().over(order_w) - 1).cast("long").alias("k"),
    )
    vt = (
        ranked.join(F.broadcast(wq), "stratum")
        .select(
            "doc_id",
            "stratum",
            "k",
            (
                (F.col("k") * 2 + 1).cast("double")
                / F.col("w_q").cast("double")
            ).alias("_vt"),
        )
    )
    return (
        vt.orderBy(F.asc("_vt"), F.asc("stratum"), F.asc("doc_id"))
        .limit(top_n)
        .select(
            "doc_id", "stratum", "k", F.round("_vt", 10).alias("vtime")
        )
    )


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    k: int,
    salt_col: Column | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group top-k WITHOUT a hot-key window: a single
    Window.partitionBy(group) puts every row of a group in one task —
    the Zipf-skew straggler the ngram-novelty de-weak removed — so the
    reduction runs in two balanced stages instead. Stage 1 ranks within
    (group, salt) where the salt is a deterministic row hash spread
    over ``salt_buckets`` partitions, keeping a local k per salted
    group; stage 2 ranks the surviving <= salt_buckets*k rows per group
    — tiny by construction. Every true top-k row survives stage 1 (it
    is top-k within its own salt a fortiori), so the two-stage result
    is exact. Deterministic end to end: the salt is a pure function of
    the row, and ``order_cols`` must already be a total order (the
    family convention: rank expression, then id)."""
    from pyspark.sql import Window

    if salt_col is None:
        salt_col = F.col("doc_id")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        survivors.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= k)
        .drop("_rn2")
    )
