#!/usr/bin/env python3
"""Local replica of the driver's correctness gate with per-query
timing. Runs every queries() entry vs its oracle_sql() at the given
sf dir and prints a summary; exits nonzero on any mismatch.

Usage: python tools/gate_check.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from oracle_harness import compare
    from postgres_scanner_spark import get_spark

    spark = get_spark(cpus="32")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    t_total = time.perf_counter()
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, probs = compare(name, df, oracles[name], sf_dir,
                                    verbose=False)
                detail = "; ".join(str(p) for p in probs)
            else:
                n = df.count()
                ok, detail = n >= 0, f"rows_only n={n}"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"err: {type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        results[name] = (ok, round(dt, 2), detail)
        flag = "ok " if ok else "FAIL"
        print(f"{flag} {dt:6.2f}s {name} {'' if ok else detail}",
              flush=True)
    total = time.perf_counter() - t_total
    bad = [n for n, (ok, _, _) in results.items() if not ok]
    print(f"\ntotal {total:.1f}s  {len(results) - len(bad)}/{len(results)} ok")
    if bad:
        print("FAILED:", ", ".join(bad))
    slow = sorted(results.items(), key=lambda kv: -kv[1][1])[:10]
    print("slowest:", json.dumps({n: v[1] for n, v in slow}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
