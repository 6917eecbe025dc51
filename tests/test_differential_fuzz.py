"""Differential determinism fuzzer: one SQL text, two engines,
bit-exact results required.

Round 9 found three cross-engine determinism classes by hand —
round() semantics (shortest-string vs binary HALF_UP), non-strict
float folds (list_sum), and CAST(decimal AS DOUBLE) double-rounding
past 2^53 — and swept each with a spelling discipline (det_round,
ordered list_reduce folds, VARCHAR-routed decimal→double). This
fuzzer is the systematic guard: hypothesis generates random
aggregation queries FROM THAT DISCIPLINE'S GRAMMAR (decimal-cast
sums, VARCHAR-routed casts, det_round spellings, exact-integer
aggregates) and asserts Spark and DuckDB agree EXACTLY — doubles
compared bit-for-bit, not within a tolerance. Any failure here is a
fourth class, caught before it ships inside an operator.

The query text is byte-identical on both engines (the q23 idiom:
`AS STRING` casts, `FLOOR(x*1e6+0.5)/1e6` rounding, ANSI
comparisons), so a mismatch isolates ENGINE semantics, not dialect
translation. Sorting happens client-side: Spark orders NULLS FIRST
and DuckDB NULLS LAST by default, which is a presentation
difference, not a value difference.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# hypothesis fuzzers = the verify-window tail (r13): excluded from
# the default run, still gate every round via -m slow
pytestmark = pytest.mark.slow


SF = "/root/testdata/sf0.001"
_TABLES = ("lineitem", "orders")
_KEYS = {
    "lineitem": ("l_returnflag", "l_linestatus", "l_linenumber"),
    "orders": ("o_orderstatus", "o_orderpriority"),
}
_DEC = {   # double columns the discipline sums via DECIMAL(18,4)
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount"),
    "orders": ("o_totalprice",),
}
_INT = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
}
_TS = {"lineitem": "l_shipdate", "orders": "o_orderdate"}
# product factors sized to the data (tpch.py discipline: the widths
# must keep the UNSCALED product inside the engine's multiply width —
# DuckDB multiplies DECIMAL(18)x(18) in int64 and overflows)
_SMALL = {"lineitem": ("l_quantity", "l_discount"), "orders": ()}


def _dec_sum(col: str) -> str:
    return (f"CAST(CAST(SUM(CAST({col} AS DECIMAL(18,4)))"
            f" AS STRING) AS DOUBLE)")


def _det_round(expr: str) -> str:
    # scientific notation is load-bearing: `1000000.0` parses as
    # DECIMAL in Spark SQL (flipping the result type and the whole
    # arithmetic tree) but DOUBLE in DuckDB; `1.0e6` is DOUBLE in
    # both (PLANS.md round-9 part 2, the w19 literal finding)
    return f"FLOOR(({expr}) * 1.0e6 + 5.0e-1) / 1.0e6"


@st.composite
def _queries(draw):
    t = draw(st.sampled_from(_TABLES))
    keys = draw(st.lists(st.sampled_from(_KEYS[t]), min_size=1,
                         max_size=2, unique=True))
    n_aggs = draw(st.integers(1, 3))
    aggs = []
    for i in range(n_aggs):
        kind = draw(st.sampled_from(
            ["count", "count_distinct", "min", "max", "sum_int",
             "dec_sum", "dec_prod_sum", "det_ratio"]))
        if kind == "count":
            aggs.append(f"COUNT(*) AS a{i}")
        elif kind == "count_distinct":
            c = draw(st.sampled_from(_INT[t]))
            aggs.append(f"COUNT(DISTINCT {c}) AS a{i}")
        elif kind in ("min", "max"):
            c = draw(st.sampled_from(_INT[t] + _DEC[t]))
            aggs.append(f"{kind.upper()}({c}) AS a{i}")
        elif kind == "sum_int":
            c = draw(st.sampled_from(_INT[t]))
            # CAST: DuckDB SUM(BIGINT) is HUGEINT, Spark is BIGINT —
            # pin the OUTPUT type, the values are exact either way
            aggs.append(f"CAST(SUM({c}) AS DOUBLE) AS a{i}")
        elif kind == "dec_sum":
            c = draw(st.sampled_from(_DEC[t]))
            aggs.append(f"{_dec_sum(c)} AS a{i}")
        elif kind == "dec_prod_sum" and _SMALL[t]:
            c1 = draw(st.sampled_from(_DEC[t]))
            c2 = draw(st.sampled_from(_SMALL[t]))
            aggs.append(
                f"CAST(CAST(SUM(CAST({c1} AS DECIMAL(12,4))"
                f" * CAST({c2} AS DECIMAL(6,3))) AS STRING)"
                f" AS DOUBLE) AS a{i}")
        elif kind == "dec_prod_sum":   # no small factor on this table
            c = draw(st.sampled_from(_DEC[t]))
            aggs.append(f"{_dec_sum(c)} AS a{i}")
        else:   # det_ratio: the q1 avg shape under det_round
            c = draw(st.sampled_from(_DEC[t]))
            aggs.append(
                f"{_det_round(_dec_sum(c) + ' / COUNT(*)')} AS a{i}")
    preds = []
    if draw(st.booleans()):
        c = draw(st.sampled_from(_DEC[t]))
        v = draw(st.integers(0, 100_000_000)) / 1000.0
        op = draw(st.sampled_from(["<", ">=", "<="]))
        preds.append(f"{c} {op} {v:.3f}e0")   # e0: DOUBLE in both
    if draw(st.booleans()):
        c = draw(st.sampled_from(_INT[t]))
        k = draw(st.integers(2, 13))
        j = draw(st.integers(0, 1))
        preds.append(f"{c} % {k} = {j}")
    if draw(st.booleans()):
        d = draw(st.integers(1, 28))
        preds.append(f"{_TS[t]} < TIMESTAMP '1996-{d:02d}-15"
                     f" 00:00:00'" if d <= 12 else
                     f"{_TS[t]} >= TIMESTAMP '1995-06-{d:02d}"
                     f" 00:00:00'")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    sql = (f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
           f"FROM {t}{where} GROUP BY {', '.join(keys)}")
    return sql


def _norm(rows):
    """Client-side canonical order + normalized cells: Decimals
    compare numerically, everything else exactly."""
    from decimal import Decimal

    def cell(v):
        if isinstance(v, Decimal):
            return ("dec", str(v.normalize()))
        return (type(v).__name__, v)

    return sorted(
        (tuple(cell(v) for v in r) for r in rows),
        key=lambda r: tuple((v is not None, str(x), str(v))
                            for x, v in r))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def views(spark):
    for t in _TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet") \
            .createOrReplaceTempView(t)
    return spark


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(sql=_queries())
def test_differential_determinism(views, duck, sql):
    got = _norm([tuple(r) for r in views.sql(sql).collect()])
    exp = _norm(duck.execute(sql).fetchall())
    assert got == exp, sql


# ---------------------------------------------------------------------
# String-surface fuzz: the oracles also lean on a portable string
# subset (lower/upper/substr/replace/left/right/md5/length/||, LIKE,
# instr) — same-text on both engines over the ASCII documents corpus.
# A failure here is a collation/locale/semantics divergence of the
# kind that would silently skew any text operator's oracle.
# ---------------------------------------------------------------------

_SCOLS = ("text", "source", "lang")


@st.composite
def _string_queries(draw):
    def expr(depth):
        kind = draw(st.sampled_from(
            ["col", "lower", "upper", "substr", "replace", "left",
             "right", "concat", "md5"] if depth > 0 else ["col"]))
        if kind == "col":
            return draw(st.sampled_from(_SCOLS))
        if kind in ("lower", "upper", "md5"):
            return f"{kind}({expr(depth - 1)})"
        if kind == "substr":
            i = draw(st.integers(1, 20))
            n = draw(st.integers(0, 30))
            return f"substr({expr(depth - 1)}, {i}, {n})"
        if kind == "replace":
            a = draw(st.sampled_from(["a", "e", "ta", "row", " "]))
            b = draw(st.sampled_from(["", "_", "xy"]))
            return f"replace({expr(depth - 1)}, '{a}', '{b}')"
        if kind in ("left", "right"):
            n = draw(st.integers(0, 25))
            return f"{kind}({expr(depth - 1)}, {n})"
        return f"({expr(depth - 1)} || {expr(depth - 1)})"

    key = draw(st.sampled_from(["source", "lang"]))
    n_aggs = draw(st.integers(1, 3))
    aggs = []
    for i in range(n_aggs):
        kind = draw(st.sampled_from(
            ["count", "count_distinct", "min", "max", "sum_len"]))
        e = expr(draw(st.integers(1, 2)))
        if kind == "count":
            aggs.append(f"COUNT(*) AS a{i}")
        elif kind == "count_distinct":
            aggs.append(f"COUNT(DISTINCT {e}) AS a{i}")
        elif kind in ("min", "max"):
            aggs.append(f"{kind.upper()}({e}) AS a{i}")
        else:
            aggs.append(f"CAST(SUM(length({e})) AS DOUBLE) AS a{i}")
    preds = []
    if draw(st.booleans()):
        k = draw(st.integers(2, 9))
        j = draw(st.integers(0, 1))
        preds.append(f"length(text) % {k} = {j}")
    if draw(st.booleans()):
        w = draw(st.sampled_from(["agg", "scan", "window", "zzz"]))
        form = draw(st.sampled_from(["like", "instr"]))
        preds.append(f"text LIKE '%{w}%'" if form == "like"
                     else f"instr(text, '{w}') > 0")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    return (f"SELECT {key}, {', '.join(aggs)} FROM documents{where} "
            f"GROUP BY {key}")


@pytest.fixture(scope="module")
def duck_docs(duck):
    duck.execute(f"CREATE VIEW IF NOT EXISTS documents AS "
                 f"SELECT * FROM '{SF}/documents.parquet'")
    return duck


@pytest.fixture(scope="module")
def views_docs(views):
    views.read.parquet(f"{SF}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return views


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(sql=_string_queries())
def test_differential_string_determinism(views_docs, duck_docs, sql):
    got = _norm([tuple(r) for r in views_docs.sql(sql).collect()])
    exp = _norm(duck_docs.execute(sql).fetchall())
    assert got == exp, sql
