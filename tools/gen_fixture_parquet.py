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
    import datetime

    from worker_spark.schemas import ARTICLE_PLACE, BIBLIOGRAPHY, PLACES

    ts = datetime.datetime(2026, 1, 1)
    bib = spark.createDataFrame(
        [(i, c, a, t, y, [], ts, "idle", ts) for (i, c, a, t, y) in FX.BIB_ROWS]
        + [(300, "AttCode", "Att Author", "", "1900", [], ts, "idle", ts)],
        schema=BIBLIOGRAPHY,
    )
    places = spark.createDataFrame(
        [
            (11, "Nordfjell", "Nordfjell i Fjella", "bygd", None, 0, None, 0, ts, "idle", ts),
            (12, "Sørdal", "", "dal", 11, 1, "4601", 0, ts, "idle", ts),
            (13, "Vestmark", "Vestmark ytre", "mark", None, 0, None, 0, ts, "idle", ts),
        ],
        schema=PLACES,
    )
    article_place = spark.createDataFrame(
        [
            ("no", 1, 11, "dialect"),
            ("no", 1, 12, "dialect"),
            ("no", 1, 11, "attestation"),
            ("no", 1, 13, "attestation"),
            ("no", 8, 11, "dialect"),
        ],
        schema=ARTICLE_PLACE,
    )
    frames = {
        "articles_parquet": arts,
        "bibliography_parquet": bib,
        "places_parquet": places,
        "article_place_parquet": article_place,
    }
    for name, df in frames.items():
        out = os.path.join(FIXTURE_DIR, name)
        df.coalesce(1).write.mode("overwrite").parquet(out)
        # drop non-data files so the directory globs cleanly
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(out, f))
        print(f"wrote {out}: {spark.read.parquet(out).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
