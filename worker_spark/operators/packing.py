"""Sequence packing: greedy binning of documents into fixed token budgets.

Training pipelines pack documents into context-window-sized sequences to
avoid padding waste. The packing decision is order-sensitive (a running
token total with reset), so it cannot be a pure window function; we shard
the corpus and run the exact greedy sequentially WITHIN each shard while
shards run in parallel (LLM-data-pipeline extension; no reference
counterpart file).

Semantics (deterministic, oracle-replayable):
* shard = doc_id % n_shards — documents are packed per shard in doc_id
  order;
* walk docs in order keeping a running token total; when adding a doc
  would exceed ``budget`` (and the current pack is non-empty), start a new
  pack. A doc larger than the budget gets a pack of its own. Every doc
  costs at least 1 slot (weight = max(n_tokens, 1)) so blank documents
  cannot stall the running total.

Scale notes (100 TB):
* ``applyInPandas`` groups by shard — one shuffle keyed on shard, then
  map-side sequential packing. Choose n_shards ~ O(cluster parallelism);
  each shard must fit executor memory (only (doc_id, n_tokens) pairs are
  shuffled — ~16 bytes/doc, so a 1e9-doc corpus shards into a few GB
  total, NOT the text itself: token counts are computed JVM-side before
  the shuffle and text is dropped).
* Packing quality vs parallelism is the standard trade-off: more shards =
  more parallelism, slightly more fragmentation (at most one underfull
  trailing pack per shard).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from worker_spark.operators.text import token_count

PACK_SCHEMA = "shard bigint, doc_id bigint, n_tokens bigint, pack_seq bigint"


def greedy_pack_sequence(token_counts: list[int], budget: int) -> list[int]:
    """The pure greedy walk: 0-based pack id per document, in input order.
    Every doc weighs max(tokens, 1); a new pack starts when the running
    total would exceed ``budget`` and the current pack is non-empty."""
    seqs: list[int] = []
    pack, cur = 0, 0
    for t in token_counts:
        w = max(int(t), 1)
        if cur > 0 and cur + w > budget:
            pack += 1
            cur = 0
        cur += w
        seqs.append(pack)
    return seqs


def greedy_pack(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a pack: ``(shard, doc_id, n_tokens,
    pack_seq)`` where pack_seq is 0-based within the shard."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["pack_seq"] = pd.Series(
            greedy_pack_sequence([int(t) for t in pdf["n_tokens"]], budget),
            dtype="int64",
        )
        return pdf[["shard", "doc_id", "n_tokens", "pack_seq"]]

    slim = docs.select(
        (F.col(id_col) % F.lit(n_shards)).alias("shard"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return slim.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization summary: ``(shard, pack_seq, n_docs,
    pack_tokens, utilization)``."""
    return packed.groupBy("shard", "pack_seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("utilization"),
    )
