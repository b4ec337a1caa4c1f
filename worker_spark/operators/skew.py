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
