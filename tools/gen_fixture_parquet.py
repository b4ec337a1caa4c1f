"""Materialize the fixture corpus (worker_spark.fixtures) as parquet under
fixture_data/ so the DuckDB oracle can read the same typed nested articles
the Spark domain queries consume (read_parquet on nested structs).

Run: python tools/gen_fixture_parquet.py   (idempotent; output committed)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixture_data")


def main() -> None:
    from worker_spark import fixtures as FX
    from worker_spark.schemas import ARTICLE_DATA
    from worker_spark.session import get_spark

    spark = get_spark("gen_fixtures", cpus=2)
    arts = spark.createDataFrame(
        [
            ("no", 1, FX.DEEP_ARTICLE),
            ("no", 4, FX.BIBLIOGRAPHY_ARTICLE),
            ("bm", 2, FX.NOUN_DUAL_PARADIGM),
            ("bm", 5, FX.ETYMOLOGY_TEMPLATE),
            ("nn", 3, {}),
            ("nn", 6, FX.VERB_SPLIT_INF),
            ("no", 8, FX.DIALECT_SHOW_FILTER),
        ],
        schema=f"dictionary: string, id: bigint, data: {ARTICLE_DATA.simpleString()}",
    )
    out = os.path.join(FIXTURE_DIR, "articles_parquet")
    arts.coalesce(1).write.mode("overwrite").parquet(out)
    # drop non-data files so the directory globs cleanly
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(out, f))
    print(f"wrote {out}: {spark.read.parquet(out).count()} articles")
    spark.stop()


if __name__ == "__main__":
    main()
