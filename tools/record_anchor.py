#!/usr/bin/env python3
"""Embed the latest serialized bench run (BENCH_out.json) as bench.py's
R4_ANCHOR. Run immediately after a clean `python bench.py` at sf0.1 with
no concurrent Spark sessions; refuses if the record is not an sf0.1 run.

Usage: python tools/record_anchor.py [anchor-name]
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "R4_ANCHOR"
    with open(os.path.join(ROOT, "BENCH_out.json")) as f:
        rec = json.load(f)
    if abs(float(rec.get("sf") or 0) - 0.1) > 1e-9:
        sys.exit(f"refusing: BENCH_out.json is sf={rec.get('sf')}, not 0.1")
    lines = [f"{name}: dict[str, float] = {{"]
    for q, t in rec["queries"].items():
        lines.append(f'    "{q}": {t},')
    lines.append("}")
    block = "\n".join(lines)
    path = os.path.join(ROOT, "bench.py")
    src = open(path).read()
    pat = re.compile(rf"{name}: dict\[str, float\] = \{{[^}}]*\}}", re.S)
    if not pat.search(src):
        sys.exit(f"refusing: no {name} block found in bench.py")
    open(path, "w").write(pat.sub(block, src, count=1))
    print(f"{name} <- {len(rec['queries'])} queries, total {rec['value']}s")


if __name__ == "__main__":
    main()
