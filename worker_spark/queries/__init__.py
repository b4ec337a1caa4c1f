"""The declared query inventory: every entry pairs a Spark DataFrame plan
with the ANSI-SQL DuckDB oracle the driver replays at sf0.01.

Conventions (driver contract, __spark_entry__.py):
* every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing);
* floating-point outputs that pass through an aggregation are rounded so
  summation-order differences between engines cannot flip the hash
  (money sums to their exact decimal width, ratios/similarities to 6);
* timestamps are emitted as formatted strings (engine-neutral).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, run=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from worker_spark.queries import (  # noqa: F401
        dedupq,
        docflat,
        domain,
        multimodalq,
        packq,
        relational,
        sampleq,
        simq,
        streamq,
        syncq,
        temporalq,
        textops,
    )

    return dict(_REGISTRY)
