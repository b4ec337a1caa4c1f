"""Vanilla driver-window rehearsal: run the first 50 registry entries
(the driver's window) at sf0.01 against their DuckDB oracles, exactly
the check the driver applies for CORRECTNESS_r{N}.json.

Usage: python tools/rehearse_window.py [start] [end]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import compare  # noqa: E402
from worker_spark.queries import all_queries  # noqa: E402
from worker_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("rehearse_window", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    specs = all_queries()
    names = list(specs)[start:end]
    bad = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        spec = specs[name]
        try:
            df = spec.run(spark, SF)
            if spec.oracle is None:
                ok, msg = df.count() >= 0, "no oracle"
            else:
                ok, msg = compare(df, spec.oracle, SF)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC {exc}"
        el = time.perf_counter() - t0
        tag = "ok" if ok else "FAIL"
        print(f"[{start + i + 1:3d}] {tag:4s} {name} ({el:.1f}s)", flush=True)
        if not ok:
            bad.append((name, str(msg)[:500]))
        spark.catalog.clearCache()
    print(f"\n{len(names) - len(bad)}/{len(names)} green")
    for name, msg in bad:
        print(f"FAIL {name}: {msg}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
