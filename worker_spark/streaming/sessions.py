"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin (``event_sessions`` in queries/relational.py) assigns
sessions with lag + running-sum windows; a live pipeline cannot window
over an unbounded stream, so this is the production-shaped stateful
version: per-user session state (start, end, n, value) carried across
micro-batches, closed sessions emitted as soon as a gap is observed, idle
sessions flushed by event-time timeout when the watermark passes
``session_end + gap``.

Scale notes:
* State is O(active users), not O(events) — each group holds one open
  session tuple. Arrow-batched transfer, grouped by user_id (one shuffle).
* The watermark bounds both late-data acceptance and state lifetime; the
  timeout branch makes state eviction explicit rather than relying on
  session closure by a future event (users that vanish would otherwise
  leak state forever).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, session_value double"
)
STATE_SCHEMA = "start timestamp, end timestamp, n bigint, val bigint"

_OUT_COLS = ["user_id", "session_start", "session_end", "n_events", "session_value"]


def _cents(val: float) -> int:
    """Quantize an event value to integer cents with floor(x*100 + 0.5) —
    the same IEEE-double expression the DuckDB oracle evaluates, so both
    engines accumulate IDENTICAL integers and summation order can never
    shift a rounded session total across a .xx5 boundary."""
    import math

    return int(math.floor(float(val) * 100.0 + 0.5))


def _session_fn(gap: pd.Timedelta, gap_ms: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            s, e, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, s, e, n, v / 100.0)], columns=_OUT_COLS
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            s, e, n, v = state.get
            s, e = pd.Timestamp(s), pd.Timestamp(e)
        else:
            s = e = None
            n, v = 0, 0
        out = []
        for ts, val in zip(rows["ts"], rows["value"]):
            if s is None:
                s = e = ts
                n, v = 0, 0
            elif (ts - e) > gap:
                out.append((user_id, s, e, n, v / 100.0))
                s = e = ts
                n, v = 0, 0
            n += 1
            v += _cents(val)
            e = ts
        state.update((s, e, n, v))
        # flush the open session once the watermark passes end + gap
        state.setTimeoutTimestamp(int(e.value // 1_000_000) + gap_ms)
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def stateful_sessionize(
    stream: DataFrame, gap_minutes: int = 30, watermark_delay: str = "3650 days"
) -> DataFrame:
    """Sessionize an event stream (schema must include ts, event_id,
    user_id, value). ``watermark_delay`` trades late-data tolerance against
    state-flush latency; bounded replays use a huge delay so no event is
    ever dropped and open sessions deliberately stay in state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap, gap_minutes * 60_000),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
