"""Property tests for the SQL-DML router's parsers.

Both review rounds found quote/paren-handling bugs in the DDL parser
(DEFAULT literals containing commas, constraint keywords inside
strings). These hypothesis strategies build CREATE TABLE column lists
and UPDATE SET clauses together with their EXPECTED parse, then
assert the parser recovers exactly that — pure Python, no Spark.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from postgres_scanner_spark.queryfn import (  # noqa: E402
    _parse_coldefs, _split_assignments, _split_statements,
    _split_top_commas)

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)

# string literals that contain every character class that has broken
# the parser: commas, parens, doubled quotes, constraint keywords
_literal_body = st.text(
    alphabet="abc,()' DEFAULTnulcheck", min_size=0, max_size=12)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_types = st.sampled_from(
    ["INT", "BIGINT", "VARCHAR", "DOUBLE PRECISION", "NUMERIC(10,2)",
     "BOOLEAN", "DATE"])


@st.composite
def _coldef(draw):
    name = draw(_ident)
    typ = draw(_types)
    parts = [f"{name} {typ}"]
    expected = {"name": name, "default": None, "not_null": False,
                "pk": False, "check": None}
    if draw(st.booleans()):
        lit = _sql_quote(draw(_literal_body))
        parts.append(f"DEFAULT {lit}")
        expected["default"] = lit
    if draw(st.booleans()):
        parts.append("NOT NULL")
        expected["not_null"] = True
    elif draw(st.booleans()):
        parts.append("PRIMARY KEY")
        expected["pk"] = True
        expected["not_null"] = True
    if draw(st.booleans()):
        lit = _sql_quote(draw(_literal_body))
        parts.append(f"CHECK ({name} <> {lit})")
        expected["check"] = f"{name} <> {lit}"
    return " ".join(parts), expected


@settings(max_examples=200, deadline=None)
@given(st.lists(_coldef(), min_size=1, max_size=5,
                unique_by=lambda ce: ce[1]["name"]))
def test_parse_coldefs_roundtrip(coldefs):
    ddl = ", ".join(c for c, _ in coldefs)
    schema, meta = _parse_coldefs(ddl)
    assert [f.name for f in schema.fields] == [e["name"] for _, e in coldefs]
    for _, e in coldefs:
        if e["default"] is not None:
            assert meta["defaults"][e["name"]] == e["default"], ddl
        else:
            assert e["name"] not in meta.get("defaults", {}), ddl
        assert (e["name"] in meta.get("not_null", [])) == e["not_null"], ddl
        if e["pk"]:
            assert [e["name"]] in meta.get("keys", []), ddl
        if e["check"] is not None:
            assert e["check"] in meta.get("checks", []), ddl


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(_ident, st.sampled_from(
        ["1 + 2", "greatest(a, b)", "'x,y'", "coalesce(v, 'a,b', 0)",
         "'it''s'", "f(g(1,2), 3)"])),
    min_size=1, max_size=4, unique_by=lambda t: t[0]))
def test_split_assignments_roundtrip(pairs):
    clause = ", ".join(f"{c} = {e}" for c, e in pairs)
    got = _split_assignments(clause)
    assert got == {c: e for c, e in pairs}, clause


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["INSERT INTO t VALUES (1, 'a;b')", "DELETE FROM t WHERE s = ';'",
     "COMMIT", "UPDATE t SET v = 'x;y' WHERE id = 1"]),
    min_size=1, max_size=4))
def test_split_statements_ignores_quoted_semicolons(stmts):
    joined = "; ".join(stmts)
    assert _split_statements(joined) == stmts, joined


def test_split_top_commas_quote_aware():
    assert _split_top_commas("a 'x,y', b (1,2), c") == \
        ["a 'x,y'", "b (1,2)", "c"]


@settings(max_examples=200, deadline=None)
@given(
    st.booleans(),                      # READ_ONLY present
    st.one_of(st.none(), _ident),       # SCHEMA value
    st.sampled_from(["POSTGRES", "postgres", "'POSTGRES'"]),
    st.booleans(),                      # option order flipped
)
def test_parse_attach_options_properties(ro, schema, typ, flip):
    from postgres_scanner_spark.queryfn import _parse_attach_options
    opts = [f"TYPE {typ}"]
    if ro:
        opts.append("READ_ONLY")
    if schema is not None:
        opts.append(f"SCHEMA '{schema}'")
    if flip:
        opts = opts[::-1]
    got = _parse_attach_options(", ".join(opts))
    assert got.get("read_only", False) is ro
    assert got.get("schema") == schema
    try:
        _parse_attach_options("TYPE MYSQL")
        raise AssertionError("TYPE MYSQL must be rejected")
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(_ident, st.booleans(), st.booleans(), st.booleans())
def test_temp_table_rewrite_properties(name, or_replace, if_nx, spell_temp):
    """Any CREATE TEMP[ORARY] TABLE lands in pg_temp exactly once,
    whether or not the statement already qualifies the name."""
    from postgres_scanner_spark.queryfn import (
        _TEMP_QUALIFIED_RE, _TEMP_TABLE_RE)
    kw = "TEMP" if spell_temp else "TEMPORARY"
    orr = "OR REPLACE " if or_replace else ""
    inx = "IF NOT EXISTS " if if_nx else ""
    for qualified in (False, True):
        tname = f"pg_temp.{name}" if qualified else name
        sql = f"CREATE {orr}{kw} TABLE {inx}{tname}(i INT)"
        out = _TEMP_TABLE_RE.sub(r"\1TABLE \2pg_temp.\3", sql)
        out = _TEMP_QUALIFIED_RE.sub(r"\1TABLE ", out)
        assert " TEMP " not in f" {out} " and " TEMPORARY " not in f" {out} ", out
        assert out.count("pg_temp.") == 1, out
        assert f"CREATE {orr}TABLE {inx}pg_temp." in out, out
