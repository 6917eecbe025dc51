#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata to larger scale factors by
TILING: N key-offset copies of every scaling table, so every
distribution (selectivity, join fan-in, group cardinality per copy,
zipf word skew) is preserved exactly — the same trick dbgen uses
(TPC-H scales by multiplying key ranges, not by reshaping
distributions). Dimension tables region/nation stay fixed, as in
TPC-H.

Two tables need more than a key offset:

- documents: a verbatim copy would give every doc N-1 exact twins, so
  near-dup candidate pairs would grow ~N^2 and dedup benchmarks would
  measure the clone artifact, not scale. Each copy i>0 suffixes every
  WORD with `_c{i}`: within-copy shingle structure (and thus the
  near-dup graph) is preserved exactly, across copies the shingle
  vocabularies are disjoint → dedup output and work scale linearly,
  the way a real corpus does.
- embeddings: vec_id offsets; vector VALUES keep as-is (brute-force /
  LSH / IVF cost is row-count-driven, ties don't change work).

Output goes under the repo (default .benchdata/sf{n}) — never into
/root/testdata, which is read-only driver property.

Usage: python tools/gen_sf.py 1 [outdir]   # sf1 = 10 x sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
BASE_SF = 0.1

# per-copy key offsets: one stride per key FAMILY so foreign keys in
# copy i keep pointing at the copy-i dimension rows
STRIDES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "suppkey": 100_000,
    "partkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> {column: key family}  (columns not listed copy verbatim)
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

FIXED = ["region", "nation"]


def copy_sql(table: str, i: int, cols) -> str:
    exprs = []
    for name, *_rest in cols:
        fam = KEYED.get(table, {}).get(name)
        if fam:
            exprs.append(f'"{name}" + {i * STRIDES[fam]} AS "{name}"')
        elif table == "documents" and name == "text" and i > 0:
            # per-copy word salt: same within-copy shingle structure,
            # disjoint vocabulary across copies
            exprs.append(
                "list_aggr(list_transform(string_split(text, ' '), "
                f"w -> w || '_c{i}'), 'string_agg', ' ') AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            # n_chars tracks the salted text (each word grew by the
            # suffix length), kept consistent for quality-score ops
            exprs.append(
                "CAST(length(list_aggr(list_transform("
                "string_split(text, ' '), "
                f"w -> w || '_c{i}'), 'string_agg', ' ')) AS BIGINT) "
                "AS n_chars")
        else:
            exprs.append(f'"{name}"')
    return (f"SELECT {', '.join(exprs)} "
            f"FROM '{SRC}/{table}.parquet'")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_copies = round(sf / BASE_SF)
    if abs(n_copies * BASE_SF - sf) > 1e-9 or n_copies < 1:
        raise SystemExit(f"sf must be a multiple of {BASE_SF}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_name = f"sf{int(sf) if sf == int(sf) else sf}"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(repo, ".benchdata", sf_name)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in FIXED:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                    f"'{out}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied", flush=True)
    for t in KEYED:
        union = " UNION ALL ".join(
            copy_sql(t, i, con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()) for i in range(n_copies))
        # row_group_size 122880 (duckdb default) keeps multiple row
        # groups per file so Spark splits the scan across tasks
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' "
                    "(FORMAT parquet)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)
    print(f"done: {out}")


if __name__ == "__main__":
    main()
