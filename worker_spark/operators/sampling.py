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
