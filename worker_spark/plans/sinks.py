"""S9 — the search-index sink.

The reference pushes documents to Meilisearch in 5,000-document
``add_or_replace`` batches and awaits task completion
(/root/reference/src/indexing.rs:75-111, src/meili.rs:571-584). Our
correctness surface is an output *table*; the chunking contract maps to
file/partition sizing:

* ``write_search_documents`` — parquet sink partitioned by ``dictionary``
  (the index-per-dictionary layout, src/meili.rs:181) with
  ``maxRecordsPerFile`` as the 5,000-doc batch analog.
* ``foreach_partition_sink`` — the live-sink shape: each partition is one
  connection pushing ``batch_size`` chunks (add_or_replace ≙ idempotent
  PUT by primary key, so task retries are safe — T10).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row

SEARCH_BATCH_SIZE = 5000


def write_search_documents(
    docs: DataFrame,
    out_dir: str,
    max_records_per_file: int = SEARCH_BATCH_SIZE,
    with_index_config: bool = True,
) -> None:
    (
        docs.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("dictionary")
        .parquet(out_dir)
    )
    if with_index_config:
        # S10: the index-settings contract travels WITH the documents
        # (src/meili.rs:273-433) so the downstream indexer configures
        # from data, not code
        from worker_spark.plans.index_config import write_index_config

        write_index_config(out_dir)


def foreach_partition_sink(
    docs: DataFrame,
    push_batch: Callable[[list[Row]], None],
    batch_size: int = SEARCH_BATCH_SIZE,
) -> None:
    """Stream every partition to a push callback in ``batch_size`` chunks.
    ``push_batch`` must be idempotent (add_or_replace semantics) — Spark
    task retries re-push the whole partition."""

    def run(rows: Iterator[Row]) -> None:
        batch: list[Row] = []
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                push_batch(batch)
                batch = []
        if batch:
            push_batch(batch)

    docs.foreachPartition(run)
