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


def test_write_refuses_unrotated_changes(tmp_path, monkeypatch, capsys):
    """The NOTES.md 'Gotcha' is now enforced, not documented (r11
    advice): running --write BEFORE rotating the window regenerated the
    baseline and blinded the guard to the unrotated window. --write
    must refuse while changed-or-new queries sit outside
    _DRIVER_WINDOW[:50]; --allow-unrotated is the deliberate escape
    hatch; rotate-then-write succeeds."""
    import pytest

    import query_hashes as QH

    window = [f"q{i}" for i in range(60)]  # q50.. are outside the head
    baseline = {"q1": "aaaa", "q55": "bbbb"}
    bl_path = tmp_path / "baseline.json"
    bl_path.write_text(json.dumps(baseline))
    monkeypatch.setattr(QH, "BASELINE_PATH", str(bl_path))

    # the pure refusal predicate
    cur = {"q1": "aaaa", "q55": "CHANGED", "q99_new": "cccc"}
    assert QH.unrotated_changes(cur, baseline, window) == ["q55", "q99_new"]
    assert QH.unrotated_changes(
        cur, baseline, ["q55", "q99_new"] + window
    ) == []

    # main --write: the write-then-rotate order is refused, baseline
    # untouched (the gotcha replayed, now failing loudly)
    monkeypatch.setattr(QH, "compute_hashes", lambda: cur)
    import worker_spark.queries as WQ

    monkeypatch.setattr(WQ, "_DRIVER_WINDOW", window)
    monkeypatch.setattr(sys, "argv", ["query_hashes.py", "--write"])
    with pytest.raises(SystemExit) as ei:
        QH.main()
    assert ei.value.code == 2
    assert json.loads(bl_path.read_text()) == baseline
    out = json.loads(capsys.readouterr().out)
    assert out["unrotated"] == ["q55", "q99_new"]

    # --allow-unrotated: the deliberate re-baseline escape hatch
    monkeypatch.setattr(
        sys, "argv", ["query_hashes.py", "--write", "--allow-unrotated"]
    )
    QH.main()
    assert json.loads(bl_path.read_text()) == cur

    # rotate-then-write: changed queries lead the window -> write OK
    bl_path.write_text(json.dumps(baseline))
    monkeypatch.setattr(WQ, "_DRIVER_WINDOW", ["q55", "q99_new"] + window)
    monkeypatch.setattr(sys, "argv", ["query_hashes.py", "--write"])
    QH.main()
    assert json.loads(bl_path.read_text()) == cur
