"""Crawl-frontier politeness scheduling (deterministic round-robin).

The reference fetches articles from an upstream API with per-dictionary
pacing (src/article_fetch_service.rs — budgeted batches per tick); web-
scale training-data crawlers generalize that to per-HOST politeness: a
fixed fleet of fetchers, each owning a set of hosts, cycling its hosts
round-robin so no host is hit more often than once per cycle.

This module is that scheduler as a pure batch plan — given a fetch
queue (doc_id, source), produce the (fetcher, tick) assignment:

* ``fetcher`` = md5-prefix(source) % n_fetchers — every source's docs
  land on ONE fetcher (per-host serialization, the politeness
  precondition), and the hash spreads sources evenly;
* within a fetcher, sources get a stable index 0..n_s-1 and the k-th
  doc of a source (doc_id order) runs at ``tick = k * n_s + idx``.

Guarantees (by construction, pinned by tests):
* collision-free — (fetcher, tick) is unique: equal ticks force equal
  source index (same source) and equal k (same doc);
* exact politeness — consecutive fetches of one source are exactly
  ``n_s`` ticks apart (the fetcher's full round-robin cycle);
* deterministic under any partitioning (hash + rank + doc_id order).

Scale shape: one window per source for k (sources are numerous — the
partition key spreads), one bounded aggregate for per-fetcher source
indexing (distinct sources, not docs), all else map-only. No shuffle
carries document payloads.

No reference counterpart file — generalizes src/article_fetch_service.rs
pacing to the multi-host crawl frontier a 100 TB pipeline feeds from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_FETCHERS = 8


def schedule_frontier(
    queue: DataFrame,
    n_fetchers: int = N_FETCHERS,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Assign (fetcher, tick) to every queued fetch. Output:
    (doc_id, source, fetcher, n_sources, tick)."""
    fetcher = (
        F.conv(F.substring(F.md5(F.col(source_col)), 1, 8), 16, 10).cast(
            "long"
        )
        % n_fetchers
    )
    q = queue.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        fetcher.alias("fetcher"),
    )
    # stable per-fetcher source index + cycle length, from a SOURCE-level
    # aggregate (bounded by distinct sources, never doc volume)
    sources = q.select("fetcher", "source").distinct()
    wsrc = Window.partitionBy("fetcher").orderBy("source")
    idx = sources.select(
        "fetcher",
        "source",
        (F.row_number().over(wsrc) - 1).cast("long").alias("src_idx"),
        F.count(F.lit(1))
        .over(Window.partitionBy("fetcher"))
        .cast("long")
        .alias("n_sources"),
    )
    wdoc = Window.partitionBy("source").orderBy("doc_id")
    return (
        q.withColumn("k", (F.row_number().over(wdoc) - 1).cast("long"))
        .join(F.broadcast(idx), ["fetcher", "source"])
        .select(
            "doc_id",
            "source",
            "fetcher",
            "n_sources",
            (F.col("k") * F.col("n_sources") + F.col("src_idx")).alias(
                "tick"
            ),
        )
    )
