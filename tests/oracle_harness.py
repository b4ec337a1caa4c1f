"""Differential harness mirroring the driver's check: run the Spark plan and
the DuckDB oracle on the same parquet tables, compare row count + values
(order-insensitive, columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb

from worker_spark.sources.registry import TPCH_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and float32/64 repr noise post-rounding
        return round(v, 9) + 0.0
    return v


def normalized_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    duck_pdf = run_oracle(oracle_sql, sf_dir)
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"columns: spark={s_cols} duckdb={d_cols}"
    a = normalized_rows(spark_pdf)
    b = normalized_rows(duck_pdf)
    if a != b:
        diff_ix = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        return False, f"values differ at sorted row {diff_ix}:\n  spark={a[diff_ix]}\n  duck ={b[diff_ix]}"
    return True, "ok"
