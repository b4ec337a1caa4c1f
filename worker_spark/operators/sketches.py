"""Mergeable sketches: HyperLogLog, KMV distinct, Count-Min heavy hitters.

At 100 TB, exact `COUNT(DISTINCT)` and exact per-token frequency tables
are shuffle-bound by cardinality; production pipelines carry SKETCHES
instead — tiny, mergeable summaries whose partial states combine with
`max`/`min`/`sum`, i.e. exactly the shapes Spark's partial aggregation
pushes map-side. Everything here is built from public constructions:

* **HyperLogLog** (Flajolet et al., AofA 2007): m=64 registers, each the
  max leading-zero rank of the bucket's hashed values. Registers merge
  with `max` — a map-side combine — so the shuffle carries at most
  m rows per partition regardless of input size.
* **KMV / bottom-k** (Bar-Yossef et al., RANDOM 2002): the k smallest
  distinct hash values; the k-th minimum estimates distinct count as
  (k-1) * H / h_k. Merges by keeping the k smallest of a union.
* **Count-Min** (Cormode & Muthukrishnan, J.Algorithms 2005): d x w
  counter grid, point estimate = min over rows; counters are plain sums
  (map-side combinable), the grid is d*w cells no matter the corpus.

Engine-portable exactness (NOTES.md): hashes are md5-prefix 32-bit
integers, ranks come from integer comparisons, and the HLL harmonic sum
is carried as an INTEGER sum of powers of two (sum 2^(27-rho) <= 2^33),
so Spark and DuckDB produce bit-identical registers, sums, and — after
one deterministic double division — identical estimates. No approximate
nondeterminism anywhere: the "approximation" is a fixed function of the
data, which is what makes a sketch auditable across engines.

No reference counterpart file — LLM-pipeline extension (the reference's
aggregate surface is exact counts; SURVEY.md §2 A-family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 64  # registers (b = 6 bucket bits)
HLL_ALPHA = 0.709  # alpha_64 from the HLL paper
HLL_WBITS = 26  # 32-bit hash minus 6 bucket bits
KMV_K = 16
CMS_DEPTH = 4
CMS_WIDTH = 256
HASH_SPACE = float(1 << 32)


def md5_prefix32(col: Column) -> Column:
    """First 8 md5 hex digits as a BIGINT in [0, 2^32) — identical to
    DuckDB's ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def bitlen_sql(expr: str, bits: int = HLL_WBITS) -> str:
    """Bit length of a non-negative integer expression as a portable CASE
    chain (no log2/bin — both of which differ or round across engines)."""
    whens = " ".join(
        f"WHEN {expr} >= {1 << k} THEN {k + 1}"
        for k in range(bits - 1, 0, -1)
    )
    return f"(CASE {whens} WHEN {expr} >= 1 THEN 1 ELSE 0 END)"


def hll_registers(
    df: DataFrame, value_col: str, *group_cols: str
) -> DataFrame:
    """Dense HLL register table per group: (group..., bucket, max_rho)
    with ALL m buckets present (empty ones as rho 0), so the harmonic sum
    is computable without knowing which buckets were hit."""
    hashed = df.select(
        *group_cols, md5_prefix32(F.col(value_col)).alias("_h")
    )
    # _h is referenced 27 times below; multi-referenced non-cheap aliases
    # survive CollapseProject, so the md5 is computed once per row
    ranked = hashed.select(
        *group_cols,
        (F.col("_h") % HLL_M).alias("bucket"),
        F.expr(
            f"cast({HLL_WBITS + 1} - "
            + bitlen_sql(f"(_h div {HLL_M})")
            + " as int)"
        ).alias("rho"),
    )
    sparse = ranked.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("max_rho")
    )
    groups = df.select(*group_cols).distinct()
    dense = groups.crossJoin(
        F.broadcast(
            ranked.sparkSession.range(HLL_M).select(
                F.col("id").cast("long").alias("bucket")
            )
        )
    )
    return dense.join(sparse, [*group_cols, "bucket"], "left").select(
        *group_cols,
        "bucket",
        F.coalesce("max_rho", F.lit(0)).alias("max_rho"),
    )


def hll_distinct(df: DataFrame, value_col: str, *group_cols: str) -> DataFrame:
    """HLL distinct-count estimate per group, with the exact distinct
    count and relative error beside it (the audit a pipeline runs at
    small SF before trusting the sketch at full scale).

    The harmonic denominator is carried as sum(2^(27 - max_rho)) — an
    exact BIGINT < 2^33 — and converted to the HLL estimate by one
    double multiply/divide, so the estimate is bit-identical across
    engines. (The small-range linear-counting correction needs ln(),
    whose last-ulp behavior is libm-specific; callers apply it
    client-side from n_zero_buckets, which is emitted.)"""
    regs = hll_registers(df, value_col, *group_cols)
    scale = 1 << (HLL_WBITS + 1)  # 2^27
    est_num = HLL_ALPHA * HLL_M * HLL_M * scale
    sketch = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 27 - max_rho)"))
        .alias("s_int"),
        F.sum(F.when(F.col("max_rho") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_buckets"),
    )
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    joined = sketch.join(exact, list(group_cols))
    est = F.lit(est_num) / F.col("s_int").cast("double")
    return joined.select(
        *group_cols,
        F.round(est, 3).alias("hll_estimate"),
        "exact_distinct",
        "n_zero_buckets",
        F.round(
            F.abs(est - F.col("exact_distinct"))
            / F.col("exact_distinct").cast("double"),
            4,
        ).alias("rel_error"),
    )


def kmv_distinct(df: DataFrame, value_col: str, *group_cols: str) -> DataFrame:
    """Bottom-k (KMV) distinct estimate per group: keep the k smallest
    distinct 32-bit hashes; the k-th minimum h_k estimates distinct
    count as (k-1) * 2^32 / h_k. Groups with fewer than k distinct
    values report their exact count (the sketch IS the full set).

    Mergeable shape (matches the module's scale claim): a two-level
    aggregation, never a per-group sort funnel. Level 1 reduces each
    (group, input-partition) slice to its sorted bottom-k array — the
    reduce work spreads over group x partition keys, so no single task
    ever sees all of a group's distinct hashes. Level 2 merges the <= P
    arrays of <= k values per group (union -> sort -> first k), the
    textbook KMV merge. The result is partitioning-invariant, so the
    oracle needs no mirror of the physical two-level shape.

    NULL handling: NULL values are ignored (matching COUNT(DISTINCT)
    semantics in both engines); a group whose values are ALL NULL has
    no distinct values to estimate and is omitted from the output —
    without the filter an all-NULL group produced an empty bottom-k
    array and element_at(arr, 0) is a runtime error."""
    h = md5_prefix32(F.col(value_col))
    local = (
        df.select(*group_cols, h.alias("hv"))
        .filter(F.col("hv").isNotNull())
        .withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(
            F.slice(F.array_sort(F.collect_set("hv")), 1, KMV_K).alias("_arr")
        )
    )
    merged = local.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_arr")))),
            1,
            KMV_K,
        ).alias("_arr")
    )
    agg = merged.select(
        *group_cols,
        F.element_at(F.col("_arr"), F.size("_arr")).alias("hk"),
        F.size("_arr").cast("long").alias("n_kept"),
    )
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double")
    )
    return (
        agg.join(exact, list(group_cols))
        .select(
            *group_cols,
            F.round(est, 3).alias("kmv_estimate"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double"),
                4,
            ).alias("rel_error"),
        )
    )


BLOOM_WORDS = 64  # filter size: 64 words x 62 usable bits = 3968 bits
BLOOM_BITS_PER_WORD = 62  # keep set bits in [0, 61]: 2^bit stays positive
BLOOM_K = 4  # hash functions per key


def _bloom_positions(value: Column) -> Column:
    """The K bit positions of a key as an array of (word, bit) structs:
    seeded md5-prefix hashes modulo the filter size. Identical in DuckDB
    via the same string concat + md5-prefix + modulo chain."""
    m = BLOOM_WORDS * BLOOM_BITS_PER_WORD
    return F.transform(
        F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
        lambda s: F.struct(
            (md5_prefix32(F.concat_ws(":", s, value)) % m)
            .cast("long")
            .alias("bitpos")
        ),
    )


def bloom_build(df: DataFrame, value_col: str, *group_cols: str) -> DataFrame:
    """Bloom filter (Bloom, CACM 1970) per group as sparse word rows:
    (group..., word, bits) with ``bits`` the BIGINT OR of 2^bit for every
    key bit landing in that word.

    Mergeable shape: bit_or is partial-aggregatable (map-side combine),
    so the shuffle carries at most BLOOM_WORDS rows per partition per
    group no matter the corpus size — the membership pre-filter that
    makes incremental dedup affordable at 100 TB (probe the tiny filter
    first; only probable members pay the exact anti-join).

    NULL keys are ignored: Spark's concat_ws would silently hash a NULL
    key as the bare seed string while the oracle's '||' concatenation
    NULL-propagates — filtering NULLs on build AND probe keeps both
    engines identical and avoids every NULL aliasing to one phantom
    member."""
    placed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.explode(_bloom_positions(F.col(value_col))).alias("p"),
    ).select(
        *group_cols,
        F.expr(f"p.bitpos div {BLOOM_BITS_PER_WORD}").alias("word"),
        F.expr(
            "shiftleft(cast(1 as bigint), "
            f"cast(p.bitpos % {BLOOM_BITS_PER_WORD} as int))"
        ).alias("bit"),
    )
    return placed.groupBy(*group_cols, "word").agg(
        F.bit_or("bit").alias("bits")
    )


def bloom_probe(
    probes: DataFrame, bloom: DataFrame, value_col: str, id_cols: list[str]
) -> DataFrame:
    """Probe keys against a built filter: a key is a probable member iff
    ALL K of its bits are set. The filter is broadcast (it is at most
    BLOOM_WORDS rows); the probe side never shuffles — map-only at any
    probe volume. Output: probe id columns + ``maybe_member``.

    No false negatives (a member's bits are all set by construction);
    false-positive rate ~ (1 - e^(-K*n/m))^K, auditable against exact
    membership downstream. NULL probe keys are dropped (see
    bloom_build). The filter must be UNGROUPED — exactly (word, bits)
    columns; probing a per-group build through this join would mix
    every group's bits and AND hits across groups, so it is rejected
    loudly."""
    extra = [c for c in bloom.columns if c not in ("word", "bits")]
    if extra:
        raise ValueError(
            "bloom_probe requires an ungrouped filter with exactly "
            f"(word, bits) columns; got extra columns {extra} — probe "
            "each group's filter separately"
        )
    pos = (
        probes.filter(F.col(value_col).isNotNull()).select(
            *id_cols, F.explode(_bloom_positions(F.col(value_col))).alias("p")
        )
        .select(
            *id_cols,
            F.expr(f"p.bitpos div {BLOOM_BITS_PER_WORD}").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), "
                f"cast(p.bitpos % {BLOOM_BITS_PER_WORD} as int))"
            ).alias("bit"),
        )
    )
    hit = pos.join(F.broadcast(bloom), "word", "left").select(
        *id_cols,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit"))
            != 0
        ).alias("_hit"),
    )
    return hit.groupBy(*id_cols).agg(
        F.min("_hit").alias("maybe_member")  # AND over the K probes
    )


def cms_place(key: Column, row: Column) -> Column:
    """The Count-Min column index of ``key`` for hash row ``row`` — the
    SINGLE definition of the cell placement (seeded md5-prefix modulo
    grid width), shared by the batch build, the batch probe, and the
    streaming variants so a seed/width change can never silently break
    the never-underestimates invariant in one copy."""
    return md5_prefix32(F.concat_ws(":", row, key)) % CMS_WIDTH


def cms_place_sql(key_expr: str, row_expr: str = "r") -> str:
    """The identical placement as DuckDB SQL (for oracle generators)."""
    return (
        "CAST(('0x' || substr(md5(CAST("
        + row_expr
        + " AS VARCHAR) || ':' || CAST("
        + key_expr
        + f" AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_WIDTH}"
    )


def cms_cells(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Count-Min grid over a token column: (row, col, cell_count) for
    d x w cells. Each token lands in one column per row via seeded
    md5-prefix hashing; cell counts are plain sums (map-side combine),
    so the shuffle carries at most d*w rows per partition."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))
    ).alias("row")
    placed = tokens.select(F.col(token_col).alias("_tok"), rows).select(
        F.col("row").cast("long").alias("row"),
        cms_place(F.col("_tok"), F.col("row")).alias("col"),
    )
    return placed.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cell_count")
    )


def cms_heavy_hitters(
    tokens: DataFrame, token_col: str = "token", top_n: int = 20
) -> DataFrame:
    """Audit the CMS point-estimate guarantee on the true top-N tokens:
    estimate = min over d rows of the token's cell; CMS never
    underestimates (estimate >= true_count) and overestimates by at most
    the hash-collision mass. Output: (token, true_count, cms_estimate,
    overestimate), true-count descending ties broken by token."""
    cells = cms_cells(tokens, token_col=token_col)
    true_counts = (
        tokens.groupBy(F.col(token_col).alias("token"))
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(top_n)
    )
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("row")
    probes = true_counts.select("token", "true_count", rows).select(
        "token",
        "true_count",
        F.col("row").cast("long").alias("row"),
        cms_place(F.col("token"), F.col("row")).alias("col"),
    )
    est = (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("token", "true_count")
        .agg(F.min("cell_count").alias("cms_estimate"))
    )
    return est.select(
        "token",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
    )


QSK_K = 512  # quantile sketch capacity: sampled values kept per group


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *group_cols: str,
    quantiles: tuple[tuple[int, int, str], ...] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
    k: int = QSK_K,
) -> DataFrame:
    """Deterministic mergeable quantile sketch (VERDICT r4 item 2 — the
    replacement for exact ``percentile()``, whose aggregation state
    buffers every value per group and single-executor-OOMs at 100 TB).

    Construction — bottom-k rank sampling: hash each row's stable key
    (md5-prefix 32-bit) and keep, per group, the k rows with the
    smallest (hash, value) pairs. ``key_col`` MUST be row-unique within
    each group (ADVICE r5): all rows sharing a key value share one hash
    and enter or miss the sample as a block, so a low-cardinality key
    (e.g. a status column) silently biases the estimates toward whole
    key-blocks. Both registered surfaces pass unique ids (event_id /
    doc_id); pass a composed unique key (concat of id columns) if no
    single column is unique. With a unique key this is a
    uniform-without-replacement sample of the group's value multiset,
    selected by hash rank instead of an RNG, so the sketch is a pure
    function of the row SET:
    partitioning-invariant, mergeable (bottom-k of a union = bottom-k of
    bottom-k's — the KMV merge), and bit-identical in any engine that
    can hash and sort. Classical KLL compaction (Karnin-Lang-Liberty,
    FOCS 2016) reaches a better eps-vs-space exponent but its compaction
    decisions depend on merge ORDER — two partitionings of the same data
    yield different (both valid) sketches, which can never hash-match a
    single-threaded oracle. Rank sampling trades the KLL exponent
    (sample error is O(sqrt(ln(1/d)/k)) rank error) for determinism;
    groups with n <= k keep everything and are EXACT.

    Physical shape — the KMV two-level bounded aggregation
    (sketches.kmv_distinct): level 1 reduces each (group, input
    partition) slice to its sorted bottom-k array, so no task ever
    holds more than k rows per slice; level 2 merges the <= P arrays of
    <= k entries. The shuffle carries <= k structs per group per
    partition regardless of group size — contrast exact percentile()'s
    per-group full-value buffer.

    Estimates are nearest-rank order statistics of the sampled values:
    the q=num/den quantile is sample value #ceil(m*num/den), computed
    with INTEGER ceiling division ((m*num + den - 1) div den) so no
    float rounding can diverge across engines. NULL and NaN values are
    excluded (NaN orders differently across engines; percentile
    semantics ignore NULLs), and rows with a NULL key are excluded too:
    md5(NULL) is NULL, and a NULL hash would sort FIRST in Spark's
    struct ordering but LAST under the oracle's ORDER BY — a confirmed
    cross-engine divergence, and a sample-bias bug (the NULL-key row
    would deterministically always be sampled). A group that is
    all-NULL/NaN/NULL-key is omitted.

    Output: (group..., m, <label>_est per quantile) with m the sample
    size (== group size when exact). Audit columns (exact rank of each
    estimate) are a separate scale-safe pass: quantile_sketch_audit.
    """
    base = (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .select(
            *group_cols,
            md5_prefix32(F.col(key_col)).alias("hv"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("hv").isNotNull())
    )
    local = (
        base.withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("hv", "v"))), 1, k
            ).alias("_arr")
        )
    )
    merged = local.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_arr"))), 1, k
        ).alias("_arr")
    )
    sampled = merged.select(
        *group_cols,
        F.size("_arr").cast("long").alias("m"),
        F.array_sort(
            F.transform("_arr", lambda s: s.getField("v"))
        ).alias("_vs"),
    )
    return rank_estimates(sampled, group_cols, quantiles)


def rank_estimates(
    sampled: DataFrame,
    group_cols,
    quantiles: tuple[tuple[int, int, str], ...] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
) -> DataFrame:
    """The sketch's SERVING math, factored so the batch build and the
    maintained quantile index (streaming/quantile_index.py) price
    estimates through literally one expression: nearest-rank order
    statistics over ``sampled`` = (group..., m, _vs sorted ascending),
    rank chosen by INTEGER ceiling division so no float rounding can
    diverge across engines."""
    est_cols = [
        F.element_at(
            F.col("_vs"),
            F.expr(f"CAST((m * {num} + {den - 1}) DIV {den} AS INT)"),
        ).alias(f"{label}_est")
        for num, den, label in quantiles
    ]
    return sampled.select(*group_cols, "m", *est_cols)


def quantile_sketch_audit(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *group_cols: str,
    quantiles: tuple[tuple[int, int, str], ...] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
    k: int = QSK_K,
) -> DataFrame:
    """quantile_sketch plus its own accuracy audit, all scale-safe: the
    exact rank fraction of each estimate is ONE conditional count over
    the group (sum of v <= est after broadcasting the tiny per-group
    estimate row back onto the data) — never a per-group value buffer.
    Output: (group..., n, m, <label>_est, <label>_rank_err) where
    rank_err = |count(v <= est)/n - q| rounded 6dp; for an exact group
    (m == n) the error is only the nearest-rank tie/granularity gap
    (<= 1/n), and for sampled groups it realizes the O(sqrt(1/k)) rank
    deviation — the per-group evidence a profiling run records beside
    each estimate.

    NULL group keys: the audit joins estimates back onto the data with a
    plain equi-join, which (like the oracle's JOIN USING) never matches
    NULL = NULL — so a group whose KEY is NULL is omitted from this
    audited output (quantile_sketch alone still emits it). Profiling
    pipelines that care about the NULL stratum should coalesce the group
    column to a sentinel first."""
    est = quantile_sketch(
        df, value_col, key_col, *group_cols, quantiles=quantiles, k=k
    )
    # the audited population is the SAME population the sketch samples
    # from — NULL/NaN values AND NULL keys excluded — so n, the rank
    # counts, and the oracle's base CTE all agree
    base = df.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
        & F.col(key_col).isNotNull()
    ).select(*group_cols, F.col(value_col).cast("double").alias("v"))
    joined = base.join(F.broadcast(est), list(group_cols))
    aggs = [F.count(F.lit(1)).alias("n")]
    for _num, _den, label in quantiles:
        aggs.append(
            F.sum(
                (F.col("v") <= F.col(f"{label}_est")).cast("long")
            ).alias(f"_c_{label}")
        )
    counted = joined.groupBy(
        *group_cols, "m", *[f"{label}_est" for _, _, label in quantiles]
    ).agg(*aggs)
    out_cols = list(group_cols) + ["n", "m"]
    for num, den, label in quantiles:
        out_cols.append(f"{label}_est")
        out_cols.append(
            F.round(
                F.abs(
                    F.col(f"_c_{label}").cast("double")
                    / F.col("n").cast("double")
                    - F.lit(num / den)
                ),
                6,
            ).alias(f"{label}_rank_err")
        )
    return counted.select(*out_cols)


def theta_set_ops(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = KMV_K,
    audit: bool = True,
) -> DataFrame:
    """Theta-sketch set operations (Dasgupta et al., "Theta sketches",
    a.k.a. the KMV generalization in the DataSketches library): estimate
    the INTERSECTION / UNION / DIFFERENCE cardinality and Jaccard
    similarity between every pair of groups from their bottom-k hash
    sketches alone — no distinct-join over the raw data.

    Reference parity: the reference keeps per-dictionary article-id sets
    and diffs them pairwise in memory (src/sync_service.rs overlap
    accounting); at 100 TB per-segment audiences cannot be materialized
    as sets, which is exactly the theta-sketch use case.

    Construction: per group, the KMV two-level bounded aggregation
    (kmv_distinct) reduces the distinct md5-prefix hashes to the sorted
    bottom-k array. theta = k-th minimum when the sketch is FULL, else
    the whole hash space (the sketch IS the group's complete hash set
    and every estimate degrades to exact — no special-casing needed:
    the scale factor becomes 1). Pair combine (a < b lexically):
    theta_ab = min(theta_a, theta_b); each side keeps hashes < theta_ab;
    then |A∩B| ~= |kept_a ∩ kept_b| * 2^32/theta_ab and likewise for
    union and difference, the standard unbiased theta estimators.
    Jaccard is the kept-set ratio (scale cancels).

    Scale shape: the only pass over the data is the bounded two-level
    sketch build (shuffle carries <= k hashes per group per input
    partition). The pair stage joins G sketch rows of <= k longs on a
    non-equi (a < b) condition — broadcast nested-loop over a
    sketch-sized input, independent of corpus size. Group cardinality G
    is expected segment-scale (event types, languages, sources), not
    key-scale.

    audit=True adds exact_inter / exact_union / rel-error columns via a
    distinct self-join on the value — the sf-scale verification path
    (and the oracle surface). At 100 TB run audit=False: estimates only,
    no exact join. NULL values are ignored (no hash); groups with no
    non-NULL values are omitted, as in kmv_distinct.
    """
    sk = theta_sketches(df, value_col, group_col, k=k)
    est = theta_pair_estimates(sk)
    if not audit:
        return est
    return _theta_audit(df, value_col, group_col, est)


def theta_sketches(
    df: DataFrame, value_col: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """The sketch-BUILD stage factored out of theta_set_ops: (g, arr,
    theta) per group via the KMV two-level bounded aggregation. The
    maintained theta index (streaming/theta_index.py) reproduces this
    frame from its stored bottom-k rows, so build and serve share the
    theta rule and the estimator below prices both identically."""
    h = md5_prefix32(F.col(value_col))
    hashed = df.select(
        F.col(group_col).alias("g"), h.alias("hv")
    ).filter(F.col("hv").isNotNull())
    local = (
        hashed.withColumn("_pid", F.spark_partition_id())
        .groupBy("g", "_pid")
        .agg(F.slice(F.array_sort(F.collect_set("hv")), 1, k).alias("_arr"))
    )
    return (
        local.groupBy("g")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("_arr")))),
                1,
                k,
            ).alias("arr")
        )
        .select("g", "arr", theta_of(k))
    )


def theta_of(k: int):
    """theta column from a bottom-k ``arr``: the k-th minimum when the
    sketch is full, else the whole hash space (under-full sketches are
    exact)."""
    return (
        F.when(
            F.size("arr") >= k,
            F.element_at(F.col("arr"), k).cast("double"),
        )
        .otherwise(F.lit(HASH_SPACE))
        .alias("theta")
    )


def theta_pair_estimates(sk: DataFrame) -> DataFrame:
    """The pair-combine ESTIMATOR stage factored out of theta_set_ops:
    (group_a, group_b, inter/union/diff/jaccard estimates) from a
    (g, arr, theta) sketch frame alone — one expression for the batch
    build and the maintained index's serve path."""
    a = sk.select(
        F.col("g").alias("group_a"),
        F.col("arr").alias("arr_a"),
        F.col("theta").alias("theta_a"),
    )
    b = sk.select(
        F.col("g").alias("group_b"),
        F.col("arr").alias("arr_b"),
        F.col("theta").alias("theta_b"),
    )
    th = F.least("theta_a", "theta_b")
    pairs = (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            th.alias("th"),
            F.filter("arr_a", lambda x: x < th).alias("ka"),
            F.filter("arr_b", lambda x: x < th).alias("kb"),
        )
        .select(
            "group_a",
            "group_b",
            "th",
            F.size("ka").alias("na"),
            F.size(F.array_intersect("ka", "kb")).alias("ni"),
            F.size(F.array_union("ka", "kb")).alias("nu"),
        )
    )
    scale = F.lit(HASH_SPACE) / F.col("th")
    est = pairs.select(
        "group_a",
        "group_b",
        F.round(F.col("ni") * scale, 3).alias("inter_est"),
        F.round(F.col("nu") * scale, 3).alias("union_est"),
        F.round((F.col("na") - F.col("ni")) * scale, 3).alias("diff_ab_est"),
        F.round(
            F.when(
                F.col("nu") > 0,
                F.col("ni").cast("double") / F.col("nu").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard_est"),
    )
    return est


def _theta_audit(
    df: DataFrame, value_col: str, group_col: str, est: DataFrame
) -> DataFrame:
    """theta_set_ops' exact-audit pass (the sf-scale verification path):
    exact pair intersections/unions via a distinct self-join over the
    RAW data, joined onto the estimates with relative errors."""
    dv = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )
    ex_n = dv.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    ex_inter = (
        dv.alias("x")
        .join(dv.alias("y"), F.col("x.v") == F.col("y.v"))
        .filter(F.col("x.g") < F.col("y.g"))
        .groupBy(
            F.col("x.g").alias("group_a"), F.col("y.g").alias("group_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    ex = (
        ex_n.alias("na")
        .join(
            F.broadcast(ex_n.alias("nb")),
            F.col("na.g") < F.col("nb.g"),
        )
        .select(
            F.col("na.g").alias("group_a"),
            F.col("nb.g").alias("group_b"),
            F.col("na.n").alias("_n_a"),
            F.col("nb.n").alias("_n_b"),
        )
        .join(ex_inter, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
            (
                F.col("_n_a") + F.col("_n_b")
                - F.coalesce("exact_inter", F.lit(0))
            ).alias("exact_union"),
        )
    )
    rel = lambda e, x: F.round(  # noqa: E731
        F.when(
            F.col(x) > 0, F.abs(F.col(e) - F.col(x)) / F.col(x).cast("double")
        ),
        4,
    )
    return (
        est.join(ex, ["group_a", "group_b"])
        .select(
            "group_a",
            "group_b",
            "inter_est",
            "union_est",
            "diff_ab_est",
            "jaccard_est",
            "exact_inter",
            "exact_union",
            rel("inter_est", "exact_inter").alias("inter_rel_err"),
            rel("union_est", "exact_union").alias("union_rel_err"),
        )
    )
