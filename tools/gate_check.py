#!/usr/bin/env python3
"""Local replica of the driver's correctness gate with per-query
timing. Runs every queries() entry vs its oracle_sql() at the given
sf dir and prints a summary; exits nonzero on any mismatch.

Usage: python tools/gate_check.py [sf_dir] [name_filter...]
       GATE_JOBS=N python tools/gate_check.py   (default 6)

Queue order is LPT from tools/gate_times.json. A streaming-vs-batch
spacing variant (max 2 streaming ops per 6 slots) was measured at
49.6/51.4 s vs plain LPT's 47.8/50.1 s on the same warm cache —
the makespan is work-bound at 6 workers, not contention-bound, so
plain LPT stays.

Queries run on GATE_JOBS worker threads, each with its OWN child
SparkSession (spark.newSession(): private SQLConf + temp-view
namespace, shared SparkContext/executors), pulling from one shared
work list. Correctness is per-query and config-independent, so
concurrency changes wall-time only: the per-query driver latency
(plan + schedule + collect + DuckDB oracle) overlaps instead of
serializing. Scratch-persist release is thread-local (runtime.py),
so one worker's start-of-query release never drops another's
in-flight intermediates.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # absolutize: a relative sf_dir reaches staging helpers that key
    # /tmp spools and symlink targets on the string (r10 bug class)
    sf_dir = os.path.abspath(sf_dir)
    only = set(sys.argv[2:])
    jobs = int(os.environ.get("GATE_JOBS", "6"))
    import __spark_entry__ as entry
    from oracle_harness import compare
    from postgres_scanner_spark import get_spark

    spark = get_spark(cpus="32")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs
             if not only or any(s in n for s in only)]
    # LPT schedule: with a shared work list the makespan is set by
    # whichever long job is drained LAST — registry order put the
    # 20 s streaming op mid-queue and made it the tail. Order by the
    # previous full run's recorded duration, longest first; queries
    # with no record (new ops) go to the front as conservatively
    # long. Correctness is order-independent; this changes wall only.
    # timings are keyed per SF (an sf1 run's absolute times would
    # otherwise overwrite the sf0.01 order; relative order mostly
    # correlates, but d5's exhaustive baseline dominates differently)
    times_path = _REPO / "tools" / "gate_times.json"
    sf_key = Path(sf_dir).name
    try:
        all_times = json.loads(times_path.read_text())
    except Exception:
        all_times = {}
    if all_times and not isinstance(next(iter(all_times.values())), dict):
        all_times = {"sf0.01": all_times}      # migrate v1 layout
    prev_times = all_times.get(sf_key) or next(
        iter(all_times.values()), {})          # any SF beats nothing
    names.sort(key=lambda n: -prev_times.get(n, float("inf")))
    results: dict[str, tuple] = {}
    lock = threading.Lock()
    it = iter(names)
    t_total = time.perf_counter()

    worker_crashes: list[str] = []

    def worker() -> None:
        try:
            _worker()
        except BaseException as exc:  # noqa: BLE001
            # a worker dying OUTSIDE the per-query try (session
            # setup, scratch release) must fail the gate, not
            # silently shrink coverage
            with lock:
                worker_crashes.append(f"{type(exc).__name__}: {exc}")

    # tiny-SF tuning (small shuffle fan-out, no AQE stage
    # materialization) saves per-query driver latency at gate SF but
    # is pathological at sf1+ (60M-row shuffles into 8 partitions,
    # no runtime re-plan) — derive the profile from the data, not
    # the dir name. Correctness is config-independent either way.
    data_bytes = sum(p.stat().st_size
                     for p in Path(sf_dir).glob("*.parquet"))
    tiny = data_bytes < 100 * 1024 * 1024   # sf0.1 ≈ 24 MB, sf1 ≈ 240 MB
    if not tiny and not os.environ.get("SPARK_GRAFT_DUCKDB_MEM"):
        # at sf1+ each worker's DuckDB connection defaults to 80% of
        # box RAM — jobs of them overcommit once the heavy-oracle LPT
        # head runs concurrently (observed: d17's oracle OOMs, then a
        # sibling connection SEGFAULTS the whole gate python, exit 0).
        # Bound each connection to a fair share with spill enabled
        # (the harness reads this env per connection); an explicit
        # env always wins.
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        share = max(4, int(total * 0.6 / jobs / 2 ** 30))
        os.environ["SPARK_GRAFT_DUCKDB_MEM"] = f"{share}GB"
        print(f"duckdb per-connection memory bounded to {share}GB "
              f"({jobs} workers)", flush=True)

    def _worker() -> None:
        # child session: own conf + own temp-view namespace for
        # memory sinks (the driver's own gate picks its own session)
        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions",
                      "8" if tiny else "32")
        sess.conf.set("spark.sql.adaptive.enabled",
                      "false" if tiny else "true")
        from postgres_scanner_spark.runtime import release_scratch
        while True:
            with lock:
                name = next(it, None)
            if name is None:
                release_scratch()
                return
            t0 = time.perf_counter()
            try:
                df = qs[name](sess, sf_dir)
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
            with lock:
                results[name] = (ok, round(dt, 2), detail)
                flag = "ok " if ok else "FAIL"
                print(f"{flag} {dt:6.2f}s {name} {'' if ok else detail}",
                      flush=True)

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(max(1, jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.perf_counter() - t_total
    bad = [n for n, (ok, _, _) in results.items() if not ok]
    # coverage check: every planned query must have a result row —
    # a crashed worker or a starved queue must never exit 0
    missing = [n for n in names if n not in results]
    print(f"\ntotal {total:.1f}s  {len(results) - len(bad)}/{len(names)} ok"
          f"  (jobs={jobs})")
    if bad:
        print("FAILED:", ", ".join(bad))
    if worker_crashes:
        print("WORKER CRASHES:", " | ".join(worker_crashes))
    if missing:
        print("NEVER RAN:", ", ".join(missing))
    slow = sorted(results.items(), key=lambda kv: -kv[1][1])[:10]
    print("slowest:", json.dumps({n: v[1] for n, v in slow}))
    if not only and not bad and not missing:
        # persist full-run durations for the next run's LPT order
        cur = dict(all_times.get(sf_key) or {})
        cur.update({n: v[1] for n, v in results.items()})
        all_times[sf_key] = cur
        try:
            times_path.write_text(json.dumps(all_times, indent=0,
                                             sort_keys=True))
        except OSError:
            pass
    spark.stop()
    sys.exit(1 if (bad or missing or worker_crashes) else 0)


if __name__ == "__main__":
    main()
