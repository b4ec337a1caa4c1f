"""Rotation-policy guard (VERDICT r5 item 6): "changed" means ANY
transitive code change. Every registered query's transitive source hash
(query function + every worker_spark function/class/constant it reaches
+ its oracle SQL, docstrings/comments stripped — tools/query_hashes.py)
is pinned in tests/query_source_hashes.json; a hash change for a query
OUTSIDE the current driver window means a refactor silently rewired an
unverified query — exactly the r5 slip (_pq_subspaces rewired three
out-of-window PQ queries).

Validated properties of the hash (see tools/query_hashes.py): two
processes agree bit-for-bit; comment- and docstring-only edits change
nothing; a one-statement edit inside similarity._pq_subspaces flags
exactly the four queries that transitively call it.

When this test fails: add the listed queries to the FRONT of
_DRIVER_WINDOW (worker_spark/queries/__init__.py), then regenerate the
baseline with `python tools/query_hashes.py --write`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

BASELINE = os.path.join(os.path.dirname(__file__), "query_source_hashes.json")


def test_out_of_window_queries_are_transitively_unchanged():
    from query_hashes import compute_hashes
    from worker_spark.queries import _DRIVER_WINDOW, all_queries

    current = compute_hashes()
    with open(BASELINE) as f:
        baseline = json.load(f)
    window = set(_DRIVER_WINDOW[:50])

    # every registered query must be hashed and in the baseline; a new
    # query must enter the window immediately
    missing = sorted(n for n in all_queries() if n not in current)
    assert not missing, f"unhashed queries: {missing}"
    new = sorted(n for n in current if n not in baseline)
    assert all(n in window for n in new), (
        f"new queries outside the driver window: "
        f"{[n for n in new if n not in window]}"
    )

    changed_outside = sorted(
        n
        for n in current
        if n in baseline and baseline[n] != current[n] and n not in window
    )
    assert not changed_outside, (
        "transitively changed queries are OUTSIDE the driver window "
        f"(rotation policy): {changed_outside}. Move them into "
        "_DRIVER_WINDOW[:50] and regenerate the baseline "
        "(python tools/query_hashes.py --write)."
    )

    # stale-baseline tripwire: an in-window change is allowed, but the
    # baseline must be regenerated in the same change set so the entry
    # does not fire spuriously after the query rotates back out
    changed_inside = sorted(
        n
        for n in current
        if n in baseline and baseline[n] != current[n] and n in window
    )
    assert not changed_inside, (
        "in-window queries changed but the committed baseline was not "
        f"regenerated: {changed_inside}. Run "
        "python tools/query_hashes.py --write and commit the result."
    )
