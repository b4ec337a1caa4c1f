"""Skew-handling utilities for hot-key joins at scale.

AQE's skew-join splitting (enabled in the session factory) covers
sort-merge joins automatically; explicit salting remains the tool for
(a) aggregations over a hot key and (b) joins AQE can't split (e.g.
bucketed inputs, or when the skewed side must stay a broadcast probe).

``salted_join``: fact rows get a random-ish deterministic salt in
[0, n_salts); the dimension side is exploded n_salts times so every
(key, salt) partition joins locally. Classic salting — the dimension
inflation is the price for an even shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt", entropy_col: str | None = None) -> DataFrame:
    """Deterministic salt derived from a high-cardinality column (falls
    back to a hash of all columns) — deterministic so retries and the
    DuckDB oracle agree, unlike rand()."""
    src = F.col(entropy_col) if entropy_col else F.concat_ws("\x00", *df.columns)
    return df.withColumn(salt_col, F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))


def explode_salts(dim: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    entropy_col: str | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with the shuffle spread over (key, salt)."""
    salted_fact = with_salt(fact, n_salts, entropy_col=entropy_col)
    salted_dim = explode_salts(dim, n_salts)
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def join_skew_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 10,
    broadcast_rows: int = 1_000_000,
    salt_share: float = 0.05,
) -> DataFrame:
    """Pre-join cardinality and skew profile: the cheap advisory pass a
    planner (or an engineer) runs BEFORE committing a multi-TB join to a
    physical strategy. The reference joins its list-vs-DB diff sets
    in-process (src/sync_service.rs) and never has to ask this question;
    at 100 TB the join strategy IS the query plan, so the profile is a
    first-class operator.

    Computes, from per-key count tables only (never the joined rows):

    * exact join output size — sum over matching keys of
      n_left(k) * n_right(k), the textbook equi-join cardinality;
    * the top_n hottest keys by output contribution, with per-side
      counts and their share of the total;
    * side/key totals (rows, distinct keys, matching keys);
    * a deterministic strategy verdict from the same numbers:
      'broadcast_right' / 'broadcast_left' when a side fits under
      ``broadcast_rows``; else 'salt_hot_keys' when the hottest key
      produces more than ``salt_share`` of the output (a single
      post-shuffle task would own that slice — AQE can split sort-merge
      skew, but salting is needed when the hot side must stay a
      broadcast probe or the input is bucketed, see salted_join); else
      'shuffle_join'.

    Scale shape: two map-side-combinable groupBy counts, a count-table
    equi-join that shuffles DISTINCT KEYS (not rows), a single-row
    summary aggregate broadcast back onto the top-N slice, and a
    sort+limit that executes as TakeOrdered. Nothing touches the joined
    row set, so profiling a 10^13-row join costs two scans.

    Output (top_n rows, or fewer if fewer keys match): key, n_left,
    n_right, contribution, share, rank, plus the summary repeated on
    every row (left_rows, right_rows, left_keys, right_keys, match_keys,
    est_join_rows, max_share, strategy). NULL join keys never match in
    an equi-join and are excluded from both sides.
    """
    lc = (
        left.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    per_key = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("contribution"),
    )
    summary = per_key.agg(
        F.count(F.lit(1)).alias("match_keys"),
        F.sum("contribution").alias("est_join_rows"),
        F.max("contribution").alias("_max_contribution"),
    )
    sides = (
        lc.agg(
            F.sum("n_left").alias("left_rows"),
            F.count(F.lit(1)).alias("left_keys"),
        )
        .crossJoin(
            rc.agg(
                F.sum("n_right").alias("right_rows"),
                F.count(F.lit(1)).alias("right_keys"),
            )
        )
        .crossJoin(summary)
    )
    max_share = F.col("_max_contribution").cast("double") / F.col(
        "est_join_rows"
    ).cast("double")
    stats = sides.select(
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        "match_keys",
        "est_join_rows",
        # bare division, no round(): round(x, 6) on a quotient can land
        # on a half-boundary Spark (HALF_UP) and DuckDB (double math)
        # resolve differently — seen live twice (verify skill notes)
        max_share.alias("max_share"),
        F.when(F.col("right_rows") <= broadcast_rows, "broadcast_right")
        .when(F.col("left_rows") <= broadcast_rows, "broadcast_left")
        .when(max_share > salt_share, "salt_hot_keys")
        .otherwise("shuffle_join")
        .alias("strategy"),
    )
    from pyspark.sql import Window

    # top-N FIRST via sort+limit (TakeOrdered — distributed partial
    # top-N per partition, no global sort); the row_number window then
    # ranks only the top_n surviving rows, never the full key table
    top = per_key.orderBy(F.desc("contribution"), F.asc("key")).limit(top_n)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("contribution"), F.asc("key"))
        ),
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        "key",
        "n_left",
        "n_right",
        "contribution",
        (
            F.col("contribution").cast("double")
            / F.col("est_join_rows").cast("double")
        ).alias("share"),
        "rank",
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        "match_keys",
        "est_join_rows",
        "max_share",
        "strategy",
    )
