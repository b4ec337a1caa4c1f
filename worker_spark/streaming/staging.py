"""Process-scoped staging cache for the registered streaming rows'
feeds (VERDICT r13 item 1: the streaming bench wall).

Every registered streaming row drives a REAL Structured Streaming job:
stage a feed directory (parquet files derived deterministically from the
fixture tables), start an availableNow stream with a fresh checkpoint,
drain the micro-batches through the structure's apply path, serve from
the maintained state. The measurement that matters — maintenance +
serve against per-row FRESH checkpoint/state — is untouched by this
module. What WAS being re-paid per row (and per best-of-two bench
repeat) is the feed staging itself: rewriting the same events table or
the same two-file document choreography into a new tempdir every call,
24 rows deep. At r13 the streaming rows were 70% of the driver bench
(341.6 of 486.8 s) and a growing share of that was this fixed staging
tax.

``staged_dir(sf_dir, kind, build)`` stages once per (sf_dir, kind) per
process and hands every later caller the same read-only directory:

* The feed CONTENT is a pure function of (fixture sf_dir, recipe) —
  every builder derives its batches deterministically from the parquet
  fixtures with engine-level expressions — so the cache key (abspath of
  sf_dir, recipe name) fully determines the bytes. ``kind`` names the
  recipe; two rows may share a kind ONLY when their staging code is
  literally the same expression tree (e.g. the three IVF rows, the
  exact/minhash pair, the four events-source rows).
* Cached directories are READ-ONLY by contract: rows consume them via
  ``spark.readStream``/``spark.read`` and never append, rewrite, or
  delete files. Restart/append choreography lives in the pytest suite,
  which stages its own private dirs.
* A ``_STAGED_OK`` marker is written only after the builder returns, so
  a crash mid-stage can never leave a half-built directory that a later
  caller would trust (Spark's parquet listing ignores ``_``-prefixed
  files, so the marker is invisible to both batch and stream readers).
* Staged files keep their first-staging mtimes; the file source orders
  by modification time and :func:`_stage_feed`'s pinned spacing stays
  intact across reuses, so batch order is identical on every replay —
  each row's fresh checkpoint replays the same two micro-batches.
* Cleanup is one ``atexit`` sweep of every cached dir (the per-call
  ``finally: rmtree(feed)`` blocks are gone with the per-call dirs).

At 100 TB the analogue is exact: the change feed is a durable, shared,
append-only location (a Kafka topic, a cloud-storage landing zone) that
every consumer reads by offset — no production consumer re-materializes
the feed per run. The per-run tempdir staging was a test-harness
artifact, not part of the measured system.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from typing import Callable

_LOCK = threading.Lock()
_CACHE: dict[tuple[str, str], str] = {}
_MARKER = "_STAGED_OK"


def _cleanup() -> None:
    with _LOCK:
        dirs = list(_CACHE.values())
        _CACHE.clear()
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


# registered unconditionally at import (a sweep of an empty cache is
# free): a lazily-flipped module flag would be mutable process state
# inside staged_dir's closure, and the rotation guard's transitive
# source hash covers module-level constants — the flag made every
# streaming row's hash depend on whether a feed had been staged earlier
# in the same process (found by the r14 full-suite verification run)
atexit.register(_cleanup)


def staged_dir(sf_dir: str, kind: str, build: Callable[[str], None]) -> str:
    """Return the cached staged directory for (sf_dir, kind), invoking
    ``build(dir)`` exactly once per process for that key. ``build`` must
    be deterministic in (sf_dir, kind) — the recipe contract above."""
    key = (os.path.abspath(sf_dir), kind)
    with _LOCK:
        cached = _CACHE.get(key)
        if cached is not None and os.path.isfile(
            os.path.join(cached, _MARKER)
        ):
            return cached
        d = tempfile.mkdtemp(prefix=f"feedcache_{kind}_")
        try:
            build(d)
        except BaseException:
            shutil.rmtree(d, ignore_errors=True)
            raise
        with open(os.path.join(d, _MARKER), "w") as f:
            f.write(kind)
        _CACHE[key] = d
        return d
