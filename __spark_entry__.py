"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real inventory lives in ``worker_spark.queries`` — each entry pairs
the Spark DataFrame plan with its DuckDB oracle SQL; this module just
adapts that registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path; make the package
# importable regardless of the caller's working directory
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Snowflake join chain (lineitem x orders x customer x nation x region)
    with broadcast dims + grouped revenue aggregation — the Spark
    re-expression of the reference's enrichment-join document build
    (SURVEY.md J4/J5).
    """
    from worker_spark.queries import all_queries

    return all_queries()["revenue_by_nation"].run(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full oracle-paired inventory: every SURVEY.md §2 operator
    with a natural single-SQL oracle, plus the LLM-data-pipeline
    families (dedup, similarity/ANN, retrieval, text quality, sampling,
    selection, sketches, chunking, streaming indexes) — ~162 entries,
    ordered by the driver-window rotation policy (worker_spark/queries/
    __init__.py)."""
    from worker_spark.queries import all_queries

    return {name: spec.run for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-expressible query."""
    from worker_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
