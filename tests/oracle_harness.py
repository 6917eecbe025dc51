"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark DataFrame query and its DuckDB oracle SQL over the same
parquet tables and compares row count, column names, and values
(order-insensitive). Used by tests/test_oracle.py and ad-hoc during
development so mismatches surface before the driver sees them.
"""

from __future__ import annotations

import math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    # big-SF certification runs several oracles concurrently next to
    # a large Spark JVM; DuckDB's defaults (80% of box RAM, all
    # cores, no spill dir for an in-memory db) then OOM the box.
    # Env-gated so the driver's own gate sees stock behavior.
    import os
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    thr = os.environ.get("SPARK_GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {int(thr)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr of the double — engines must agree bit-for-bit
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if v is None:
        return ""
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def compare(name, spark_df, oracle_sql, sf_dir, *, verbose=True):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    sc, sn = normalize(s_cols, s_rows)
    dc, dn = normalize(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
    if len(sn) != len(dn):
        problems.append(f"row count differs: spark={len(sn)} duck={len(dn)}")
    if not problems and sn != dn:
        bad = 0
        for a, b in zip(sn, dn):
            if a != b:
                bad += 1
                if verbose and bad <= 3:
                    problems.append(f"row diff:\n  spark={a}\n  duck ={b}")
        problems.append(f"{bad} differing rows of {len(sn)}")
    ok = not problems
    if verbose:
        print(f"[{'OK' if ok else 'FAIL'}] {name} rows={len(sn)}")
        for p in problems:
            print("   ", p)
    return ok, problems
