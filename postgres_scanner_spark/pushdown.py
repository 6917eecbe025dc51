"""Filter pushdown: Spark-side filters → remote Postgres WHERE SQL.

Parity with reference src/postgres_filter_pushdown.cpp
(TransformFilters/TransformFilter/TransformComparison): =, <>, <, >,
<=, >=, IS NULL, IS NOT NULL, AND, OR, IN, struct-field extract —
rendered as a conjunction appended to the generated COPY/SELECT.

The filter model here is the stable tuple form Spark's DataSource
pushdown uses (("col", "op", value)), plus nested ("and"/"or",
[children]). The catalog's JDBC path feeds these from DataFrame
filter expressions; unit tests feed them directly.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any, Sequence

_COMPARISON_OPS = {
    "=": "=", "==": "=", "eq": "=",
    "<>": "<>", "!=": "<>", "ne": "<>",
    "<": "<", "lt": "<",
    ">": ">", "gt": ">",
    "<=": "<=", "le": "<=",
    ">=": ">=", "ge": ">=",
    "like": "LIKE",
}


def quote_ident(name: str) -> str:
    """Quote a Postgres identifier; nested struct access becomes
    (col).field (reference: postgres_filter_pushdown.cpp STRUCT_EXTRACT)."""
    if "." in name:
        head, *rest = name.split(".")
        expr = '"' + head.replace('"', '""') + '"'
        for f in rest:
            expr = f"({expr}).\"" + f.replace('"', '""') + '"'
        return expr
    return '"' + name.replace('"', '""') + '"'


def quote_literal(value: Any) -> str:
    """Render a python value as a PG literal (reference:
    postgres_filter_pushdown.cpp TransformLiteral → Value::ToSQLString)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        # repr() renders NaN/Infinity as bare nan/inf — invalid PG SQL;
        # PG wants the quoted-cast spellings
        if math.isnan(value):
            return "'NaN'::float8"
        if math.isinf(value):
            return ("'Infinity'" if value > 0 else "'-Infinity'") + "::float8"
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    if isinstance(value, datetime):
        return "'" + value.isoformat(sep=" ") + "'"
    if isinstance(value, date):
        return "'" + value.isoformat() + "'"
    if isinstance(value, (bytes, bytearray)):
        return "'\\x" + bytes(value).hex() + "'::bytea"
    s = str(value).replace("'", "''")
    if "\x00" in s:
        # NUL is illegal inside PG text values; apply the same
        # replacement policy the reference exposes
        # (pg_null_byte_replacement, postgres_extension.cpp:179)
        from .settings import SETTINGS
        s = s.replace("\x00", SETTINGS.pg_null_byte_replacement or "")
    return f"'{s}'"


def transform_filter(f: Sequence[Any]) -> str:
    """One filter → SQL fragment.

    Accepted shapes:
      ("col", "op", value)            comparison
      ("col", "isnull") / ("col", "isnotnull")
      ("col", "in", [v1, v2, ...])
      ("and"|"or", [f1, f2, ...])
      ("not", f)
    """
    head = f[0]
    if head in ("and", "or"):
        parts = [transform_filter(c) for c in f[1]]
        joiner = " AND " if head == "and" else " OR "
        return "(" + joiner.join(parts) + ")"
    if head == "not":
        return "NOT (" + transform_filter(f[1]) + ")"
    col = quote_ident(head)
    op = f[1].lower()
    if op == "isnull":
        return f"{col} IS NULL"
    if op == "isnotnull":
        return f"{col} IS NOT NULL"
    if op == "in":
        vals = ", ".join(quote_literal(v) for v in f[2])
        return f"{col} IN ({vals})"
    if op in _COMPARISON_OPS:
        return f"{col} {_COMPARISON_OPS[op]} {quote_literal(f[2])}"
    raise ValueError(f"unsupported pushdown op: {op!r}")


def transform_filters(filters: Sequence[Sequence[Any]] | None) -> str:
    """All filters → 'WHERE ...' (empty string when none), mirroring
    reference TransformFilters which ANDs every table filter."""
    if not filters:
        return ""
    return "WHERE " + " AND ".join(transform_filter(f) for f in filters)


def render_select(
    table: str,
    columns: Sequence[str] | None,
    filters: Sequence[Sequence[Any]] | None = None,
    *,
    schema: str = "public",
    limit: int | None = None,
    ctid_range: tuple[int, int] | None = None,
) -> str:
    """Generated remote query — projection pushdown + filter pushdown +
    ctid-range task predicate (reference: postgres_scanner.cpp:205-243)."""
    cols = ", ".join(quote_ident(c) for c in columns) if columns else "*"
    sql = f'SELECT {cols} FROM "{schema}"."{table}"'
    preds: list[str] = []
    if ctid_range is not None:
        lo, hi = ctid_range
        preds.append(f"ctid BETWEEN '({lo},0)'::tid AND '({hi},0)'::tid")
    where = transform_filters(filters)
    if where:
        preds.append(where[len("WHERE "):])
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if limit is not None:
        sql += f" LIMIT {limit}"
    return sql
