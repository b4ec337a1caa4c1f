"""Differential tests: every declared query must match its DuckDB oracle at
sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare
from worker_spark.queries import all_queries

_SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(spark, name):
    spec = _SPECS[name]
    df = spec.run(spark, SF_ORACLE)
    assert df.columns, f"{name}: empty schema"
    if spec.oracle is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, spec.oracle, SF_ORACLE)
    assert ok, f"{name}: {msg}"
