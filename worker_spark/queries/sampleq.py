"""Stratified-sampling / data-mixture queries over ``documents``.

Spark side: worker_spark.operators.sampling (map-only md5-bucket predicate).
Oracle side: the identical bucket arithmetic in DuckDB — md5 prefixes are
engine-portable, so the exact sampled set is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import sampling as S
from worker_spark.queries import register
from worker_spark.sources import load_table

_RATES = {"en": 0.5, "de": 0.8, "es": 0.9, "zh": 0.7}
_DEFAULT = 1.0  # fr and anything unseen

_BUCKET = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {S.DENOM}"
_RATE = (
    "CASE lang WHEN 'de' THEN 0.8 WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.9 "
    f"WHEN 'zh' THEN 0.7 ELSE {_DEFAULT} END"
)
# Integer keep-thresholds, pre-rounded host-side from the SAME helper the
# Spark plan uses — the cutoff is an exact literal in both engines (no
# double-vs-DECIMAL product rounding window).
_THRESH = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN {S.threshold_for(r)}" for k, r in sorted(_RATES.items())
    )
    + f" ELSE {S.threshold_for(_DEFAULT)} END"
)


@register(
    "doc_stratified_sample",
    f"""
    SELECT doc_id, lang, source, {_BUCKET} AS strat_bucket
    FROM documents
    WHERE {_BUCKET} < {_THRESH}
    """,
    doc="Deterministic per-language downsampling: md5(doc_id) bucket vs "
    "stratum rate — map-only, shuffle-free, reproducible across engines "
    "and cluster layouts (training-data mixture construction).",
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.stratified_sample(
        docs, _RATES, strat_col="lang", id_col="doc_id", default_rate=_DEFAULT
    ).select("doc_id", "lang", "source", "strat_bucket")


@register(
    "doc_mixture_report",
    f"""
    SELECT lang AS stratum,
           count(*) AS total_rows,
           CAST(sum(CASE WHEN {_BUCKET} < {_THRESH}
                    THEN 1 ELSE 0 END) AS BIGINT) AS sampled_rows,
           round(CAST({_RATE} AS DOUBLE), 6) AS target_rate,
           round(CAST(CAST(sum(CASE WHEN {_BUCKET} < {_THRESH}
                              THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / count(*), 6)
               AS achieved_rate
    FROM documents
    GROUP BY lang
    """,
    doc="Mixture audit: per-stratum target vs achieved sampling rate in one "
    "aggregation pass.",
)
def q_doc_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.mixture_report(
        docs, _RATES, strat_col="lang", id_col="doc_id", default_rate=_DEFAULT
    )


@register(
    "doc_quota_sample",
    f"""
    WITH b AS (
        SELECT doc_id, lang, {_BUCKET} AS strat_bucket FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, strat_bucket,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY strat_bucket, doc_id) AS sample_rank
        FROM b
    )
    SELECT doc_id, lang, strat_bucket, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked WHERE sample_rank <= 30
    """,
    doc="Exact-quota sampling: deterministic 30 docs per language by "
    "(md5 bucket, id) rank — hits the quota exactly where rate-based "
    "sampling only approximates it.",
)
def q_doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        S.quota_sample(docs, k=30, strat_col="lang", id_col="doc_id")
        .select(
            "doc_id",
            "lang",
            "strat_bucket",
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


_SPLIT_DIGEST = "md5(CAST(doc_id AS VARCHAR) || ':v1')"


@register(
    "doc_split_assign",
    f"""
    WITH d AS (SELECT doc_id, lang, {_SPLIT_DIGEST} AS dg FROM documents)
    SELECT doc_id, lang,
           ('0x' || substr(dg, 1, 8))::BIGINT % {S.SPLIT_DENOM} AS split_bucket,
           CASE WHEN ('0x' || substr(dg, 1, 8))::BIGINT % {S.SPLIT_DENOM} < 9800
                    THEN 'train'
                WHEN ('0x' || substr(dg, 1, 8))::BIGINT % {S.SPLIT_DENOM} < 9900
                    THEN 'val'
                ELSE 'test' END AS split,
           CAST(('0x' || substr(dg, 9, 8))::BIGINT % 8 AS INTEGER) AS shard,
           substr(dg, 17, 8) AS shuffle_key
    FROM d
    """,
    doc="Deterministic train/val/test split (98/1/1 by md5 myriad bucket), "
    "shard routing, and global shuffle key — three independent decisions "
    "from disjoint slices of one salted digest; map-only, rerun-stable, "
    "engine-portable.",
)
def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return S.split_assign(d, id_col="doc_id").select(
        "doc_id", "lang", "split_bucket", "split", "shard", "shuffle_key"
    )


@register(
    "doc_mixture_weights",
    f"""
    WITH per AS (
        SELECT source AS stratum, CAST(count(*) AS BIGINT) AS stratum_rows
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(stratum_rows) AS BIGINT) AS total_rows FROM per),
    q AS (
        SELECT stratum, stratum_rows, total_rows,
               greatest(CAST(floor(sqrt(CAST(stratum_rows AS DOUBLE)
                                        / total_rows)
                                   * {S.MIX_Q}) AS BIGINT),
                        CAST(1 AS BIGINT)) AS w_q
        FROM per, tot
    ),
    qt AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_q_total FROM q)
    SELECT stratum, stratum_rows,
           round(CAST(stratum_rows AS DOUBLE) / total_rows, 6) AS share,
           round(CAST(w_q AS DOUBLE) / w_q_total, 6) AS mix_weight,
           round(CAST(w_q AS DOUBLE) / w_q_total * total_rows / stratum_rows, 6)
               AS epochs
    FROM q, qt
    """,
    doc="Temperature-scaled (alpha=0.5) mixture weights per source: "
    "sqrt-share reweighting with dyadic fixed-point quantization so the "
    "normalized weights and duplication factors hash-check exactly; one "
    "bounded groupBy + broadcast totals.",
)
def q_doc_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return S.mixture_weights(d, strat_col="source")


@register(
    "doc_weighted_sample",
    f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS weight,
               CAST(length(text) AS BIGINT) * 4294967296.0
                   / (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT) + 1) AS q
        FROM documents
    )
    SELECT doc_id, weight, round(q, 4) AS priority
    FROM scored
    ORDER BY q DESC, doc_id ASC
    LIMIT {S.WEIGHTED_SAMPLE_K}
    """,
    doc=f"Weighted sampling without replacement via priority sampling "
    f"(Duffield'07): priority = weight * 2^32 / md5-hash, top-"
    f"{S.WEIGHTED_SAMPLE_K} kept (length-weighted here). One double "
    "division over exact integers — engine-exact; orderBy+limit compiles "
    "to the mergeable distributed TopK, never a global sort.",
)
def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.weighted_priority_sample(docs)


def _weighted_reservoir_oracle() -> str:
    """The A-ES top-k replay — shared by the batch doc_weighted_reservoir
    row and streaming_weighted_reservoir: the maintained reservoir
    provably equals the batch top-k over the union corpus (the A-ES key
    is a pure per-row expression and top-k is associative), so ONE
    oracle serves both (the one-oracle-for-both pattern, seventh
    instance)."""
    return f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS weight,
               CAST(round(ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                  AS BIGINT) + 1.0) * {S.AES_MICRO}) AS BIGINT)
                   - {S.AES_LN_2POW32_MICROS} AS aes_key_micros
        FROM documents
        WHERE length(text) > 0
    )
    SELECT doc_id, weight, aes_key_micros
    FROM scored
    ORDER BY CAST(aes_key_micros AS DOUBLE) / CAST(weight AS DOUBLE) DESC,
             doc_id ASC
    LIMIT {S.WEIGHTED_SAMPLE_K}
    """


@register(
    "doc_weighted_reservoir",
    _weighted_reservoir_oracle(),
    doc=f"Weighted reservoir sampling (A-ES, Efraimidis-Spirakis'06): "
    f"rank by u^(1/w) — reformulated as ln(u)/w with ln(u) quantized to "
    "integer micros from the exact md5-prefix integer, so the key is one "
    "exact-integer division (no pow, engine-exact). Rows with weight <= 0 "
    "are filtered on BOTH sides (A-ES's w > 0 precondition; a w == 0 "
    "division is NULL in Spark but NaN/inf in double SQL — a latent "
    "engine divergence). The ppswor sibling "
    f"of doc_weighted_sample's priority sampler; top-{S.WEIGHTED_SAMPLE_K} "
    "via mergeable distributed TakeOrdered, never a heap pass or global "
    "sort.",
)
def q_doc_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.weighted_reservoir_sample(docs)


@register(
    "doc_mixture_interleave",
    f"""
    WITH per AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS stratum_rows
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(stratum_rows) AS BIGINT) AS total_rows FROM per),
    wq AS (
        SELECT stratum,
               greatest(CAST(floor(sqrt(CAST(stratum_rows AS DOUBLE)
                                        / CAST(total_rows AS DOUBLE))
                                   * {S.MIX_Q}) AS BIGINT),
                        CAST(1 AS BIGINT)) AS w_q
        FROM per, tot
    ),
    ranked AS (
        SELECT doc_id, lang AS stratum,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS k
        FROM documents
    ),
    vt AS (
        SELECT r.doc_id, r.stratum, r.k,
               CAST(r.k * 2 + 1 AS DOUBLE) / CAST(w.w_q AS DOUBLE) AS _vt
        FROM ranked r JOIN wq w USING (stratum)
    )
    SELECT doc_id, stratum, k, round(_vt, 10) AS vtime
    FROM vt
    ORDER BY _vt ASC, stratum ASC, doc_id ASC
    LIMIT {S.INTERLEAVE_TOP_N}
    """,
    doc=f"Deterministic mixture-weighted training ORDER via stride "
    "scheduling (Waldspurger'95): k-th doc of a stratum is consumed at "
    "virtual time (2k+1)/w_q with the temperature-mixture integer "
    "weights, so every prefix matches the mixture within one document; "
    "md5 pseudo-shuffle within strata makes the whole schedule "
    f"reproducible. First {S.INTERLEAVE_TOP_N} positions via distributed "
    "TakeOrdered (full shard writes would range-sort on vtime). The "
    "last pipeline step: the order samples actually reach the trainer.",
)
def q_doc_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.mixture_interleave(docs, "lang")
