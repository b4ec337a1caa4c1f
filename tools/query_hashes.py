#!/usr/bin/env python3
"""Per-query TRANSITIVE source hashes — the rotation-policy guard
(VERDICT r5 item 6).

The driver oracle-checks only the first 50 registry entries per round,
and the stated policy is that a CHANGED query always re-enters that
window. Round 5 showed "changed" must mean *any transitive code
change*: refactoring a shared core (similarity._pq_subspaces) rewired
three out-of-window queries without touching their own functions. This
module makes the policy mechanical:

* for every registered query, compute a hash over the query function's
  transitive closure of worker_spark source — the function itself, every
  worker_spark function/class it references (statically, by AST walk:
  bare names, module-attribute chains, function-level imports),
  recursively — plus the module-level constants it reads and the oracle
  SQL string the driver will replay;
* sources are AST-normalized with docstrings stripped before hashing, so
  comment- and docstring-only edits do not count as changes (they cannot
  alter results);
* the committed baseline is tests/query_source_hashes.json; the guard
  test (tests/test_rotation_guard.py) fails when a hash changed for any
  query OUTSIDE _DRIVER_WINDOW[:50].

Static analysis is conservative, not perfect: dynamic dispatch through
data (none in the query layer today) would be invisible. Every style
used by the registry — ``S.fn(...)``, ``from worker_spark.x import fn``
inside the function body, bare names from module-level imports, shared
SQL-fragment helpers — is covered.

Usage:
  python tools/query_hashes.py          # diff current vs baseline
  python tools/query_hashes.py --write  # regenerate the baseline

``--write`` ENFORCES the rotation order (r11 advice — NOTES.md's
"Gotcha" was a live footgun: regenerating the baseline BEFORE rotating
the window blinded the guard to the unrotated window). It refuses to
regenerate while any changed-or-new query sits outside
``_DRIVER_WINDOW[:50]``; rotate first, write second.
``--allow-unrotated`` is the escape hatch for a genuine re-baseline.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import os
import sys
import textwrap
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WS_PREFIX = "worker_spark"
BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "query_source_hashes.json",
)

_norm_cache: dict[int, str] = {}
_refs_cache: dict[int, list] = {}

_PLAIN = (str, int, float, bool, bytes, type(None))
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _plain_repr(val) -> str | None:
    """repr for process-stable plain data only. Containers of plain data
    recurse; anything else (the query _REGISTRY dict, compiled objects,
    DataFrames) returns None and is excluded — default reprs embed
    memory addresses, which made every hash process-unique (found while
    validating reproducibility). Strings have the repo root relativized:
    fixture-path constants are derived from __file__ and would otherwise
    make hashes depend on where the checkout lives."""
    if isinstance(val, str):
        return repr(val.replace(_REPO_ROOT, "<repo>"))
    if isinstance(val, _PLAIN):
        return repr(val)
    if isinstance(val, (tuple, frozenset)):
        parts = [
            _plain_repr(v)
            for v in (
                sorted(val, key=repr) if isinstance(val, frozenset) else val
            )
        ]
        if any(p is None for p in parts):
            return None
        return f"{type(val).__name__}({','.join(parts)})"
    # MUTABLE containers (dict/list/set) are excluded even when their
    # contents are plain: module-level mutables are runtime state, not
    # source — extraction._FEATURE_CACHE starts {} and fills during
    # query execution, which made the hash depend on whether a query
    # had RUN in the process (guard flaked under the full suite, green
    # standalone). Immutable config tables in this repo are tuples.
    return None


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module),
        ):
            body = getattr(node, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _norm_source(obj) -> str | None:
    """Docstring-stripped AST dump of the object's source (comments are
    never in the AST, so comment-only edits hash identically)."""
    key = id(obj)
    if key in _norm_cache:
        return _norm_cache[key]
    try:
        src = textwrap.dedent(inspect.getsource(obj))
        dumped = ast.dump(_strip_docstrings(ast.parse(src)))
    except (OSError, TypeError, SyntaxError):
        dumped = None
    _norm_cache[key] = dumped
    return dumped


def _is_ws(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    if isinstance(obj, types.ModuleType):
        mod = obj.__name__
    return bool(mod and mod.startswith(WS_PREFIX))


def _qualkey(obj) -> str:
    if isinstance(obj, types.ModuleType):
        return obj.__name__
    return f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', repr(obj))}"


def _referenced(fn) -> list:
    """(kind, key, payload) triples for every worker_spark thing the
    function's body references: ("obj", key, object) for functions/
    classes/modules to recurse into, ("const", key, repr) for constant
    values folded straight into the hash."""
    key = id(fn)
    if key in _refs_cache:
        return _refs_cache[key]
    out: list = []
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        _refs_cache[key] = out
        return out
    g = getattr(fn, "__globals__", {}) or {}

    def classify(name_key: str, val) -> None:
        if val is None:
            return
        if isinstance(val, types.ModuleType):
            if val.__name__.startswith(WS_PREFIX):
                out.append(("obj", val.__name__, val))
            return
        if callable(val) or inspect.isclass(val):
            if _is_ws(val):
                out.append(("obj", _qualkey(val), val))
            return
        # plain data (thresholds, tier tuples, SQL fragments): value
        # matters, provenance string keeps renames visible
        r = _plain_repr(val)
        if r is not None:
            out.append(("const", name_key, r))

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith(WS_PREFIX):
                try:
                    mod = importlib.import_module(node.module)
                except ImportError:
                    continue
                for a in node.names:
                    classify(
                        f"{node.module}.{a.name}", getattr(mod, a.name, None)
                    )
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(WS_PREFIX):
                    try:
                        out.append(
                            ("obj", a.name, importlib.import_module(a.name))
                        )
                    except ImportError:
                        pass
        elif isinstance(node, ast.Attribute) and isinstance(
            node.value, ast.Name
        ):
            base = g.get(node.value.id)
            if isinstance(base, types.ModuleType) and base.__name__.startswith(
                WS_PREFIX
            ):
                classify(
                    f"{base.__name__}.{node.attr}",
                    getattr(base, node.attr, None),
                )
        elif isinstance(node, ast.Name):
            val = g.get(node.id)
            if val is None or isinstance(val, types.ModuleType):
                continue  # modules handled via Attribute access
            if (callable(val) or inspect.isclass(val)) and _is_ws(val):
                out.append(("obj", _qualkey(val), val))
            elif not callable(val) and not inspect.isclass(val):
                mod = g.get("__name__", "")
                if isinstance(mod, str) and mod.startswith(WS_PREFIX):
                    r = _plain_repr(val)
                    if r is not None:
                        out.append(("const", f"{mod}.{node.id}", r))
    _refs_cache[key] = out
    return out


def _closure_entries(root_fn) -> list[tuple[str, str]]:
    """Sorted (key, normalized-source-or-value) pairs for the transitive
    closure of ``root_fn`` within worker_spark."""
    entries: dict[str, str] = {}
    seen: set[str] = set()
    work: list[tuple[str, object]] = [(_qualkey(root_fn), root_fn)]
    while work:
        key, obj = work.pop()
        if key in seen:
            continue
        seen.add(key)
        if isinstance(obj, types.ModuleType):
            src = _norm_source(obj)
            if src is not None:
                entries[key] = src
            continue
        src = _norm_source(obj)
        if src is not None:
            entries[key] = src
        fns: list = []
        if inspect.isclass(obj):
            fns = [
                m
                for _, m in inspect.getmembers(obj, inspect.isfunction)
                if _is_ws(m)
            ]
        elif callable(obj):
            fns = [obj]
        for f in fns:
            for kind, rkey, payload in _referenced(f):
                if kind == "const":
                    entries[f"const:{rkey}"] = payload
                else:
                    work.append((rkey, payload))
    return sorted(entries.items())


def compute_hashes() -> dict[str, str]:
    from worker_spark.queries import all_queries

    result: dict[str, str] = {}
    for name, spec in all_queries().items():
        h = hashlib.sha256()
        for key, payload in _closure_entries(spec.run):
            h.update(key.encode())
            h.update(b"\x00")
            h.update(payload.encode())
            h.update(b"\x01")
        h.update(b"oracle\x00")
        h.update(
            (spec.oracle or "<rows-only>")
            .replace(_REPO_ROOT, "<repo>")
            .encode()
        )
        result[name] = h.hexdigest()[:16]
    return result


DRIVER_SLOTS = 50


def unrotated_changes(
    current: dict[str, str],
    baseline: dict[str, str],
    window: list[str],
    slots: int = DRIVER_SLOTS,
) -> list[str]:
    """Changed-or-new queries that are NOT inside the driver window's
    first ``slots`` entries — exactly the set ``--write`` must refuse
    to bake into a fresh baseline (once written, the guard test can no
    longer see that they were never rotated in)."""
    head = set(window[:slots])
    return sorted(
        n
        for n in current
        if baseline.get(n) != current[n] and n not in head
    )


def main() -> None:
    from worker_spark.queries import _DRIVER_WINDOW

    current = compute_hashes()
    if "--write" in sys.argv:
        try:
            with open(BASELINE_PATH) as f:
                prior = json.load(f)
        except FileNotFoundError:
            prior = {}
        offenders = unrotated_changes(current, prior, _DRIVER_WINDOW)
        if offenders and "--allow-unrotated" not in sys.argv:
            print(
                json.dumps(
                    {
                        "refused": "changed-or-new queries sit outside "
                        f"_DRIVER_WINDOW[:{DRIVER_SLOTS}] — rotate the "
                        "window first, then --write (or pass "
                        "--allow-unrotated for a deliberate re-baseline)",
                        "unrotated": offenders,
                    }
                )
            )
            sys.exit(2)
        with open(BASELINE_PATH, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        print(f"wrote {len(current)} hashes to {BASELINE_PATH}")
        return
    try:
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)
    except FileNotFoundError:
        print("no baseline; run with --write")
        sys.exit(1)
    changed = sorted(
        n for n in current if baseline.get(n) != current[n]
    )
    removed = sorted(n for n in baseline if n not in current)
    print(json.dumps({"changed_or_new": changed, "removed": removed}))


if __name__ == "__main__":
    main()
