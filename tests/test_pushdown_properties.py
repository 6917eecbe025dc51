"""Property-based tests for the filter-pushdown SQL generator:
any filter tree we can build must render to SQL that the target
engine parses, and literal quoting must round-trip hostile strings
(reference: postgres_filter_pushdown.cpp handles arbitrary constants
from the planner)."""

import pytest

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_scanner_spark.pushdown import quote_literal, transform_filters

# type-consistent (column, value-strategy) pairs — the planner only
# pushes filters whose literal type matches the column
_COL_VALS = {
    "a": st.integers(min_value=-10**12, max_value=10**12),
    "b": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "c": st.text(max_size=30),
}
_cols = st.sampled_from(sorted(_COL_VALS))
_ops = st.sampled_from(["=", "<>", "<", ">", "<=", ">="])

_comparison = _cols.flatmap(
    lambda c: st.tuples(st.just(c), _ops, _COL_VALS[c]))
_nullcheck = st.tuples(_cols, st.sampled_from(["isnull", "isnotnull"]))
_in = _cols.flatmap(
    lambda c: st.tuples(st.just(c), st.just("in"),
                        st.lists(_COL_VALS[c], min_size=1, max_size=5)))
_leaf = st.one_of(_comparison, _nullcheck, _in)


def _trees(depth):
    if depth == 0:
        return _leaf
    sub = _trees(depth - 1)
    return st.one_of(
        _leaf,
        st.tuples(st.sampled_from(["and", "or"]),
                  st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just("not"), sub),
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(_trees(2), min_size=1, max_size=4))
def test_rendered_where_parses(filters):
    where = transform_filters(filters)
    assert where.startswith("WHERE ")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b DOUBLE, c VARCHAR)")
    # engine must parse and execute the generated predicate
    con.execute(f"SELECT COUNT(*) FROM t {where}")
    con.close()


@pytest.mark.slow
@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_string_literal_roundtrip(s):
    lit = quote_literal(s)
    con = duckdb.connect()
    got = con.execute(f"SELECT {lit}").fetchone()[0]
    con.close()
    # NUL bytes are unrepresentable in SQL text literals; they are
    # scrubbed per pg_null_byte_replacement (default: removed)
    assert got == s.replace("\x00", "")


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=30))
def test_bytes_literal_is_pg_hex_format(b):
    """bytea literals use Postgres's whole-string hex form
    ('\\x0102'::bytea) — that's the remote dialect the rendered WHERE
    executes in (DuckDB's per-byte blob escapes differ)."""
    lit = quote_literal(b)
    assert lit == "'\\x" + b.hex() + "'::bytea"
    assert bytes.fromhex(lit[3:-8]) == b
