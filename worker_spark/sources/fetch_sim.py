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


class CircuitOpenError(RuntimeError):
    """Raised fail-fast while the breaker is open (upstream cooling down)."""


class CircuitBreaker:
    """T7 circuit breaker (src/uib_client.rs:29-85): opens after
    ``threshold`` CONSECUTIVE failures, fails fast for ``cooldown_s``, then
    half-opens — the next call is a trial whose success closes the breaker
    and whose failure re-opens it for another cooldown.

    A breaker instance lives inside one fetch task (one Python worker), so
    state is per-executor-slot — exactly the scope a connection pool has in
    the reference's worker pool. ``clock`` is injectable for tests."""

    def __init__(
        self,
        threshold: int = 10,
        cooldown_s: float = 60.0,
        clock: Callable[[], float] | None = None,
    ) -> None:
        import time

        self.threshold = threshold
        self.cooldown_s = cooldown_s
        self._clock = clock or time.monotonic
        self._consecutive = 0
        self._opened_at: float | None = None

    @property
    def is_open(self) -> bool:
        if self._opened_at is None:
            return False
        if self._clock() - self._opened_at >= self.cooldown_s:
            return False  # cooled down: half-open, admit a trial call
        return True

    def wrap(self, fn: Callable) -> Callable:
        def guarded(*args, **kwargs):
            if self.is_open:
                remaining = self.cooldown_s - (self._clock() - self._opened_at)
                raise CircuitOpenError(
                    f"circuit open after {self._consecutive} consecutive "
                    f"failures; retry in {remaining:.1f}s"
                )
            try:
                result = fn(*args, **kwargs)
            except Exception:
                self._consecutive += 1
                if self._consecutive >= self.threshold:
                    self._opened_at = self._clock()
                raise
            self._consecutive = 0
            self._opened_at = None
            return result

        return guarded


def fetch_articles(
    job_keys: DataFrame,
    resolver: Callable[[str, int], dict | None],
    num_partitions: int | None = None,
    breaker_threshold: int = 10,
    breaker_cooldown_s: float = 60.0,
) -> DataFrame:
    """Partitioned fetch: (job_key 'dict:id') rows -> fetch results.
    ``resolver(dictionary, article_id) -> article dict | None``.

    Each task guards its resolver with a circuit breaker INSIDE the retry
    loop: every attempt counts toward the consecutive-failure threshold,
    and an open breaker raises ``CircuitOpenError`` (non-transient, so the
    retry wrapper stops immediately instead of hammering a down upstream)."""
    if num_partitions:
        job_keys = job_keys.repartition(num_partitions, "job_key")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        breaker = CircuitBreaker(
            threshold=breaker_threshold, cooldown_s=breaker_cooldown_s
        )
        fetch = with_retries(breaker.wrap(resolver))
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
