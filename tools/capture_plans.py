#!/usr/bin/env python3
"""Capture `.explain("formatted")` for the plan-visible pieces the r14
optimization round touched, so plan claims are checkable without
running Spark (OPTIMIZATION_r14.md evidence files).

Usage: python tools/capture_plans.py <outdir> [suffix]
  e.g. python tools/capture_plans.py plans/r14 after

Captured plans (run at sf0.001 so the capture is cheap; plan SHAPE is
scale-independent):
* curation_decide          — IncrementalCurationIndex.decide() over the
                             corpus (the map-only-layer fusion: count
                             the doc_id joins / Exchanges).
* cc_round                 — one min-label round of connected_components
                             (the path-halving self-join).
* contamination_scope      — the d_c re-derive scope frame (journal
                             union folded into one distinct).
* gate_admissions          — the ingest gate's serve-side admission
                             join (unchanged semantics; baseline).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)

    import tempfile

    from pyspark.sql import functions as F

    from worker_spark.session import get_spark
    from worker_spark.sources import load_table

    spark = get_spark("capture_plans", cpus=8)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out: dict[str, str] = {}

    # --- curation decide() ------------------------------------------------
    from worker_spark.queries.textops import (
        _GOPHER_MIN_WORDS,
        _GOPHER_SW,
        CURATION2_MAX_TBR,
        CURATION2_MIN_LOGP,
        CURATION2_MIN_QUALITY,
        CURATION2_MIN_TTR,
        CURATION2_TARGET,
    )
    from worker_spark.operators.text import GOPHER_MIN_STOPWORD_HITS
    from worker_spark.streaming.curation_index import (
        CurationConfig,
        IncrementalCurationIndex,
    )

    root = tempfile.mkdtemp(prefix="capplan_cur_")
    idx = IncrementalCurationIndex(
        spark,
        root,
        lm_train_docs=docs,
        config=CurationConfig(
            target_lang=CURATION2_TARGET,
            min_quality=CURATION2_MIN_QUALITY,
            min_ttr=CURATION2_MIN_TTR,
            max_tbr=CURATION2_MAX_TBR,
            min_logp=CURATION2_MIN_LOGP,
            gopher_min_words=_GOPHER_MIN_WORDS,
            gopher_stopwords=_GOPHER_SW,
            gopher_min_sw_hits=GOPHER_MIN_STOPWORD_HITS,
        ),
    )
    out["curation_decide"] = _fmt(idx.decide(docs))

    # --- one connected-components round (round >= 2) ----------------------
    # replicate the loop body verbatim on a tiny graph so the round's
    # join structure is visible. BOTH shapes are emitted from this one
    # run, each matching its code version exactly: _before = the plain
    # pre-r14 step (labels <- min(self, neighbor min)); _after = the
    # r14 step + pointer jump through the previous round's checkpointed
    # labels (operators/components.py round body, it >= 2).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a: bigint, id_b: bigint"
    )
    ed = edges.select(F.col("id_a").alias("s"), F.col("id_b").alias("d")).localCheckpoint()
    sym = (
        ed.union(ed.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    # a prior round's labels: a checkpointed node-table leaf, as in the loop
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    nbr_min = (
        sym.join(labels, sym["d"] == labels["id"])
        .groupBy(sym["s"].alias("nid"))
        .agg(F.min("comp").alias("nbr_min"))
    )
    stepped = (
        labels.alias("l")
        .join(nbr_min.alias("n"), F.col("l.id") == F.col("n.nid"), "left")
        .select(
            F.col("l.id").alias("id"),
            F.col("l.comp").alias("oldc"),
            F.least(
                F.col("l.comp"), F.coalesce(F.col("n.nbr_min"), F.col("l.comp"))
            ).alias("c1"),
        )
    )
    out["cc_round_plain"] = _fmt(
        stepped.select(
            "id",
            F.col("c1").alias("comp"),
            (F.col("c1") < F.col("oldc")).alias("chg"),
        )
    )
    par = labels.select(F.col("id").alias("pid"), F.col("comp").alias("pc"))
    jumped = F.least(F.col("c1"), F.coalesce(F.col("pc"), F.col("c1")))
    round_df = stepped.join(par, stepped["c1"] == par["pid"], "left").select(
        "id", jumped.alias("comp"), (jumped < F.col("oldc")).alias("chg")
    )
    out["cc_round_jump"] = _fmt(round_df)

    # --- cc fallback: label-contracted star input (r14, second pass) ------
    # the star fallback no longer restarts from raw edges: it contracts
    # each edge through the partial min-label progress (two node-table
    # hash joins) and composes star's labels back with one left join —
    # this captures the contracted-edge frame + composition shape
    sym = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "s: long, d: long"
    ).localCheckpoint()
    labels_cc = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id") - F.col("id") % 4)
        .localCheckpoint()
    )
    contracted = (
        sym.join(
            labels_cc.select(F.col("id").alias("s"), F.col("comp").alias("ca")), "s"
        )
        .join(
            labels_cc.select(F.col("id").alias("d"), F.col("comp").alias("cb")), "d"
        )
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb")
    )
    out["cc_fallback_contraction"] = _fmt(contracted)

    # --- gate admissions (serve side) -------------------------------------
    from worker_spark.streaming.ingest_gate import StreamingIngestGate
    from worker_spark.queries.textops import (
        CURATION_MAX_TBR,
        CURATION_MIN_LOGP,
        CURATION_MIN_QUALITY,
        CURATION_MIN_TTR,
    )

    ev = docs.filter(F.col("doc_id") % 5 == 0)
    root2 = tempfile.mkdtemp(prefix="capplan_gate_")
    gate = StreamingIngestGate(
        spark,
        root2,
        eval_docs=ev,
        lm_train_docs=docs,
        config=CurationConfig(
            target_lang="en",
            min_quality=CURATION_MIN_QUALITY,
            min_ttr=CURATION_MIN_TTR,
            max_tbr=CURATION_MAX_TBR,
            min_logp=CURATION_MIN_LOGP,
            gopher_min_words=_GOPHER_MIN_WORDS,
            gopher_stopwords=_GOPHER_SW,
            gopher_min_sw_hits=GOPHER_MIN_STOPWORD_HITS,
        ),
    )
    gate.apply_batch(docs.filter(F.col("doc_id") % 5 != 0))
    out["gate_admissions"] = _fmt(gate.admissions())

    for name, text in out.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        n_py = text.count("BatchEvalPython") + text.count("ArrowEvalPython")
        print(f"{path}: {n_ex} Exchange nodes, {n_py} Python-eval nodes")
    spark.stop()


if __name__ == "__main__":
    main()
