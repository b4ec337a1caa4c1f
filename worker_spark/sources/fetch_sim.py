"""S2 — the per-article fetch stage, network-free.

The reference fetches each changed article over HTTP from a worker pool
(/root/reference/src/uib_client.rs:201-209; pool sizing
src/main.rs:517,534). The Spark shape is a *partitioned fetch*: job keys
spread across partitions, each task resolving its keys through an
Arrow-batched ``mapInPandas`` stage — the pattern a real deployment uses
with ``requests`` inside the batch loop (pool concurrency == partition
count; T7's transient-retry classification wraps the call).

No network exists in this environment, so the resolver is injected: tests
and the fixture pipeline use a local corpus lookup (dict or parquet dir);
production injects the HTTP client. A key resolving to nothing yields a
``found=false`` row — the reference's 404 -> reset-to-idle path
(src/sync_service.rs:225-229).
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("job_key", T.StringType(), False),
        T.StructField("dictionary", T.StringType()),
        T.StructField("article_id", T.LongType()),
        T.StructField("found", T.BooleanType(), False),
        T.StructField("data_json", T.StringType()),
    ]
)

TRANSIENT_MARKERS = ("timeout", "connect", "429", "502", "503", "504")


def is_transient(err: Exception) -> bool:
    """T7 retry predicate (src/main.rs:98-113, src/uib_client.rs:117-151):
    only timeouts / connection failures / 5xx / 429 retry."""
    msg = str(err).lower()
    return any(m in msg for m in TRANSIENT_MARKERS)


def with_retries(fn: Callable, attempts: int = 4, backoff_base: float = 0.5) -> Callable:
    """HTTP-level retry wrapper: exponential backoff 0.5s * 2^(n-1),
    transient errors only (src/uib_client.rs:100,142)."""
    import time

    def wrapped(*args, **kwargs):
        for attempt in range(1, attempts + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as err:  # noqa: BLE001 — classify and rethrow
                if attempt == attempts or not is_transient(err):
                    raise
                time.sleep(backoff_base * (2 ** (attempt - 1)))
        raise AssertionError("unreachable")

    return wrapped


def fetch_articles(
    job_keys: DataFrame,
    resolver: Callable[[str, int], dict | None],
    num_partitions: int | None = None,
) -> DataFrame:
    """Partitioned fetch: (job_key 'dict:id') rows -> fetch results.
    ``resolver(dictionary, article_id) -> article dict | None``."""
    if num_partitions:
        job_keys = job_keys.repartition(num_partitions, "job_key")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = with_retries(resolver)
        for pdf in batches:
            out = []
            for key in pdf["job_key"]:
                dictionary, _, raw_id = key.partition(":")
                try:
                    article_id = int(raw_id)
                except ValueError:
                    out.append((key, None, None, False, None))
                    continue
                doc = fetch(dictionary, article_id)
                out.append(
                    (
                        key,
                        dictionary,
                        article_id,
                        doc is not None,
                        json.dumps(doc) if doc is not None else None,
                    )
                )
            yield pd.DataFrame(
                out, columns=["job_key", "dictionary", "article_id", "found", "data_json"]
            )

    return job_keys.select("job_key").mapInPandas(run, schema=FETCH_RESULT_SCHEMA)
