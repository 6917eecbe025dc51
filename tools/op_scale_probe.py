#!/usr/bin/env python3
"""Per-operator Spark-vs-DuckDB timing at a given scale, same
protocol as BENCHSCALE.md (same box, back-to-back, min-of-2,
32 threads both engines). Usage:

  python tools/op_scale_probe.py <sf_dir> <name> [<name> ...]

Prints one JSON line: {"sf_dir": ..., "ops": {name: {"spark": s,
"duckdb": s, "ratio": r}}}. Streaming queries run their full
drain loop on both sides (the oracle models the drained result).
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import closing
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    sf_dir = os.path.abspath(sys.argv[1])   # relative spellings reach
    names = sys.argv[2:]                    # /tmp-spool keying (r10)
    import duckdb
    import __spark_entry__ as entry
    from postgres_scanner_spark import get_spark
    queries = entry.queries()
    oracles = entry.oracle_sql()
    spark = get_spark(cpus=32)

    def fresh_con():
        # one connection PER OP, closed even on failure: a heavy
        # oracle's hash tables and allocator fragmentation otherwise
        # spill into the next op's budget (an sf10 t20 run OOM'd the
        # light m13 oracle that followed it); sizing mirrors
        # oracle_harness's env gates
        c = duckdb.connect()
        c.execute(f"SET threads TO "
                  f"{os.environ.get('SPARK_GRAFT_DUCKDB_THREADS', 32)}")
        mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
        if mem:
            c.execute(f"SET memory_limit='{mem}'")
            c.execute("SET temp_directory='/tmp/duckspill'")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS "
                      f"SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    # warm both engines / the page cache
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    with closing(fresh_con()) as warm:
        warm.execute("SELECT COUNT(*) FROM lineitem").fetchall()
    out = {}
    for name in names:
        s_best = d_best = None
        with closing(fresh_con()) as con:
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                s_best = dt if s_best is None else min(s_best, dt)
                if name in oracles:
                    t0 = time.perf_counter()
                    con.execute(oracles[name]).fetchall()
                    dt = time.perf_counter() - t0
                    d_best = dt if d_best is None else min(d_best, dt)
        out[name] = {
            "spark": round(s_best, 2),
            "duckdb": round(d_best, 2) if d_best is not None else None,
            "ratio": round(s_best / d_best, 2) if d_best else None,
        }
        print(f"# {name}: spark={out[name]['spark']}s "
              f"duckdb={out[name]['duckdb']}s "
              f"ratio={out[name]['ratio']}", file=sys.stderr)
    from bench import _data_key
    print(json.dumps({"sf_dir": sf_dir, "data_key": _data_key(sf_dir),
                      "ops": out}))


if __name__ == "__main__":
    main()
