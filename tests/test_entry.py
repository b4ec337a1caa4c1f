"""Smoke: the driver contract surface (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue", "n_items"]


def test_query_and_oracle_keys_align(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert qs, "no queries declared"
    assert set(os_) <= set(qs)
    # every oracle-less query is an explicitly documented weaker check
    assert all(callable(fn) for fn in qs.values())
