#!/usr/bin/env python3
"""Empirical scaling probe: run representative operators at 1x / 4x / 10x
the sf0.1 document volume and report how wall time grows.

The 100 TB claim everywhere in this repo is an ARGUMENT about plan
shapes (banded joins, map-only extraction, bounded aggregation states);
this probe is the cheap empirical check that the shapes actually scale:
a healthy operator grows ~linearly in input volume (ratio_10x ~ 10 or
less against 14x replicated characters), a broken one (all-pairs join,
single-task funnel, quadratic fold) blows up super-linearly and is
visible immediately at 10x.

Replication keeps the workload shape honest: each copy's doc_id is
offset and a copy-marker token is appended to the text, so replicas are
DISTINCT documents (no artificial mega-clusters of exact duplicates
that would change the dedup workload class), while length and character
distributions stay representative.

Writes nothing outside /tmp; prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)


def replicated_docs(spark, factor: int):
    from pyspark.sql import functions as F

    from worker_spark.sources.registry import load_table

    base = load_table(spark, SF_DIR, "documents")
    if factor == 1:
        # identical physical layout to the replicated frames — without
        # this the 1x baseline runs on the parquet's 1-2 input splits
        # while 4x/10x run on defaultParallelism partitions, and the
        # reported ratios compare layouts, not volumes
        return base.repartition(spark.sparkContext.defaultParallelism)
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_copy") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.concat(
                F.col("text"), F.lit(" copymark"), F.col("_copy").cast("string")
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(10)).alias("n_chars"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def probes(docs):
    """(name, thunk) pairs — thunk runs the operator to completion."""
    from pyspark.sql import functions as F

    from worker_spark.operators import dedup as D
    from worker_spark.operators import sketches as K
    from worker_spark.operators import substrings as SS
    from worker_spark.operators import text as T

    return [
        (
            "exact_dedup",
            lambda: D.exact_dedup(docs).count(),
        ),
        (
            "minhash_lsh_pairs",
            lambda: D.lsh_candidate_pairs(D.minhash_signatures(docs)).count(),
        ),
        (
            "winnow_fingerprints",
            lambda: SS.winnow_fingerprints(docs).count(),
        ),
        (
            "bigram_lm_scores",
            lambda: T.bigram_lm_scores(docs).count(),
        ),
        (
            "bloom_build",
            lambda: K.bloom_build(docs, "text").count(),
        ),
        (
            "token_stats",
            lambda: T.with_text_stats(docs).agg(F.sum("n_tokens")).count(),
        ),
    ]


def main() -> None:
    from worker_spark.session import get_spark

    spark = get_spark(
        "scaling_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1).count()
    results: dict[str, dict[int, float]] = {}
    vols: dict[int, int] = {}
    for factor in FACTORS:
        docs = replicated_docs(spark, factor)
        docs = docs.localCheckpoint()  # pay replication once, not per probe
        vols[factor] = docs.count()
        for name, thunk in probes(docs):
            t0 = time.perf_counter()
            thunk()
            results.setdefault(name, {})[factor] = round(
                time.perf_counter() - t0, 3
            )
        spark.catalog.clearCache()
    print("| operator | " + " | ".join(f"{f}x" for f in FACTORS) + " | t10/t1 |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    line: dict[str, object] = {"rows": vols}
    for name, times in results.items():
        ratio = round(times[FACTORS[-1]] / times[FACTORS[0]], 2)
        print(
            f"| {name} | "
            + " | ".join(f"{times[f]:.2f}s" for f in FACTORS)
            + f" | {ratio} |"
        )
        line[name] = {"times": times, "t10_over_t1": ratio}
    spark.stop()
    print(json.dumps(line))


if __name__ == "__main__":
    main()
