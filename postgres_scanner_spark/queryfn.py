"""postgres_query / postgres_execute equivalents.

Parity with reference src/postgres_query.cpp (run arbitrary SELECT on
the remote side, scan the result) and src/postgres_execute.cpp (run
DDL/DML remotely, no result).

Spark-first: for an attached parquet-backed database the "remote
side" is Spark SQL over the registered views — the query text runs
unchanged through Catalyst. For a JDBC-attached database the query
ships to Postgres as a subquery-dbtable (true passthrough: Postgres
executes it, Spark scans the result — identical split of work to the
reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog


def pg_query(catalog: Catalog, alias: str, sql: str) -> DataFrame:
    """postgres_query(db, sql): the SQL executes on the attached db's
    engine; the result is a scannable DataFrame.

    reference: src/postgres_query.cpp PostgresQueryBind — validates
    the db handle, strips trailing ';', requires a SELECT.
    """
    if alias not in catalog.attached:
        raise KeyError(f"Failed to find attached database {alias!r}")
    db = catalog.attached[alias]
    # strip any run of trailing semicolons/whitespace ('SELECT ...; ; ')
    # — the reference's PostgresQueryBind does the same before wrapping
    sql = sql.strip().rstrip("; \t\r\n")
    if not sql or not _READ_STMT_RE.match(sql):
        # reference: PostgresQueryBind rejects non-SELECT input — and
        # routing DDL here would bypass pg_execute's READ_ONLY gate
        raise ValueError(
            "postgres_query: input must be a SELECT statement")
    if db.backend == "jdbc":
        info = db.conn
        return catalog.spark.read.jdbc(
            info.jdbc_url, f"({sql}) AS pg_query_subq",
            properties=info.jdbc_properties())
    if db.backend == "duckdb":
        # true passthrough: the attached engine executes the SQL and the
        # postgres_scan DataSource streams the result on the EXECUTORS
        # (reference: PostgresQueryBind runs the text on the PG side and
        # streams the result set). No driver materialization: the driver
        # only probes the result schema (LIMIT 0); executor partitions
        # fetch Arrow batches.
        from .pg_datasource import ensure_registered
        ensure_registered(catalog.spark)
        return (catalog.spark.read.format("postgres_scan")
                .option("dsn", db.source).option("query", sql)
                .option("pushdown", "false").load())
    if db.backend == "store":
        # DESCRIBE / PRAGMA table_info carry constraint+default info
        # the session catalog doesn't know (attach_describe.test)
        if m := re.match(rf"^\s*DESCRIBE\s+{_QIDENT}\s*;?\s*$", sql,
                         re.IGNORECASE):
            rows = db.store.describe(_unquote_table(m.group(1)))
            return catalog.spark.createDataFrame(
                [(r["column_name"], r["column_type"], r["null"],
                  r["key"], r["default"], None) for r in rows],
                "column_name STRING, column_type STRING, null STRING, "
                "key STRING, default STRING, extra STRING")
        if m := re.match(r"^\s*PRAGMA\s+table_info\s*\(\s*'(.+?)'\s*\)"
                         r"\s*;?\s*$", sql, re.IGNORECASE):
            rows = db.store.describe(_unquote_table(m.group(1)))
            return catalog.spark.createDataFrame(
                [(r["cid"], r["column_name"], r["column_type"],
                  r["null"] == "NO", r["default"], r["key"] == "PRI")
                 for r in rows],
                "cid INT, name STRING, type STRING, notnull BOOLEAN, "
                "dflt_value STRING, pk BOOLEAN")
    return _pg_sql(catalog.spark, sql)


import re


def _escape_pg_literals(sql: str) -> str:
    """Rewrite PG-dialect quoting for Spark's parser:

    - string literals: in PG (standard_conforming_strings) a
      backslash inside '...' is a LITERAL character and '' is the
      quote escape; Spark processes backslash escapes, so '\\42\\'
      is a parse error. Double every backslash — Spark decodes them
      back — and '' keeps working on both.
      (spark.sql.parser.escapedStringLiterals is deprecated AND
      changes '' handling in Spark 4, so a conf flip cannot do this;
      spark.sql.ansi.doubleQuotedIdentifiers would drag in ANSI
      arithmetic semantics.) Reference: attach_backslash.test.
    - identifiers: PG "Quoted_Ident" ("" escapes a quote) becomes
      Spark `Quoted_Ident` (`` escapes a backtick). Reference:
      attach_case_sensitive_columns.test, attach_keywords.test."""
    out = []
    in_s = in_d = False
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        # comments pass through untouched — an apostrophe inside
        # '-- ...' or '/* ... */' must not flip literal state
        if not in_s and not in_d:
            if ch == "-" and sql.startswith("--", i):
                j = sql.find("\n", i)
                j = n if j < 0 else j
                out.append(sql[i:j])
                i = j
                continue
            if ch == "/" and sql.startswith("/*", i):
                j = sql.find("*/", i + 2)
                j = n if j < 0 else j + 2
                out.append(sql[i:j])
                i = j
                continue
            # PG dollar-quoted string ($$...$$ / $tag$...$tag$): the
            # body is RAW — no escapes, quotes/backslashes literal.
            # Spark has no dollar quoting, so re-emit as a standard
            # literal with Spark's escaping ('' for quotes, doubled
            # backslashes). An apostrophe in the body must not flip
            # the literal state machine.
            if ch == "$":
                if m := re.match(r"\$([A-Za-z_]\w*)?\$", sql[i:]):
                    tag = m.group(0)
                    j = sql.find(tag, i + len(tag))
                    body = sql[i + len(tag):j if j >= 0 else n]
                    out.append("'" + body.replace("\\", "\\\\")
                               .replace("'", "''") + "'")
                    i = (j + len(tag)) if j >= 0 else n
                    continue
            # PG E'...' escape string: backslash escapes are REAL
            # here (unlike standard '...'), which is exactly Spark's
            # default literal semantics — drop the E, copy the body
            # verbatim (\x pairs opaque), keep '' handling
            if (ch in "eE" and sql.startswith("'", i + 1)
                    and (i == 0 or not (sql[i - 1].isalnum()
                                        or sql[i - 1] in '_"`'))):
                out.append("'")
                j = i + 2
                while j < n:
                    if sql[j] == "\\" and j + 1 < n:
                        out.append(sql[j:j + 2])
                        j += 2
                        continue
                    if sql[j] == "'":
                        if sql.startswith("''", j):
                            out.append("''")
                            j += 2
                            continue
                        break
                    out.append(sql[j])
                    j += 1
                out.append("'")
                i = j + 1
                continue
        if in_s:
            if ch == "\\":
                out.append("\\\\")
                i += 1
                continue
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    out.append("''")
                    i += 2
                    continue
                in_s = False
            out.append(ch)
        elif in_d:
            if ch == '"':
                if i + 1 < n and sql[i + 1] == '"':
                    out.append('"')
                    i += 2
                    continue
                in_d = False
                out.append("`")
            elif ch == "`":
                out.append("``")
            else:
                out.append(ch)
        elif ch == "'":
            in_s = True
            out.append(ch)
        elif ch == '"':
            in_d = True
            out.append("`")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _pg_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run routed PG-dialect SQL under PG string-literal semantics."""
    return spark.sql(_escape_pg_literals(sql))


# identifier: bare word OR double-quoted (PG-style, "" escapes a quote)
# — reference handles quoted/keyword/case-sensitive table names
# (attach_keywords.test, attach_case_sensitive_tables.test); tables may
# be schema-qualified (attach_schemas.test)
_ID = r'(?:"(?:[^"]|"")+"|\w+)'
_IDENT = rf"({_ID})"
_QIDENT = rf"({_ID}(?:\.{_ID})?)"

# MERGE INTO t USING src ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
# WHEN NOT MATCHED THEN INSERT * — the delta-style upsert form; the
# source is a subquery or view, keys are same-named equality columns
_MERGE_PREFIX_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+{_QIDENT}\s+USING\s+", re.IGNORECASE)
_MERGE_CLAUSES_RE = re.compile(
    r"^ON\s+(.+?)"
    r"(\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*)?"
    r"(\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

# COPY t TO 'path' (FORMAT fmt) / COPY (SELECT ..) TO 'path' /
# COPY t FROM 'path' (FORMAT fmt) — reference:
# test/sql/misc/postgres_binary.test (binary-format file interchange
# driven through SQL). Reference FORMAT names map onto copyio's:
# binary/postgres_binary → the PGCOPY wire codec, text/csv → text,
# parquet → the Spark-native columnar path.
_COPY_TO_RE = re.compile(
    rf"^\s*COPY\s+(?:{_QIDENT}|\((.+)\))\s+TO\s+'([^']+)'"
    r"(?:\s*\(\s*FORMAT\s+(\w+)\s*\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_COPY_FROM_RE = re.compile(
    rf"^\s*COPY\s+{_QIDENT}\s+FROM\s+'([^']+)'"
    r"(?:\s*\(\s*FORMAT\s+(\w+)\s*\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def _copy_fmt(word: str | None) -> str | None:
    if word is None:
        return None
    w = word.lower()
    return {"binary": "pg_binary", "postgres_binary": "pg_binary",
            "text": "text", "csv": "text", "parquet": "binary"}.get(w, w)


_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_QIDENT}(?:\s+WHERE\s+(.+?))?;?\s*$",
    re.IGNORECASE | re.DOTALL)
# PG TRUNCATE: unconditionally empty the table (fast path of DELETE)
_TRUNCATE_RE = re.compile(
    rf"^\s*TRUNCATE\s+(?:TABLE\s+)?{_QIDENT};?\s*$", re.IGNORECASE)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+{_QIDENT}\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?;?\s*$",
    re.IGNORECASE | re.DOTALL)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+INTO\s+{_QIDENT}\s*"
    rf"(?:\(([^()]*)\)\s*)?"   # optional explicit column list
    rf"(SELECT\s+.+?|VALUES\s*\(.+?\));?\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?{_QIDENT};?\s*$", re.IGNORECASE)
# CREATE TEMP/TEMPORARY TABLE x → CREATE TABLE pg_temp.x (reference:
# attach_temporary_table.test — PG session temp tables live in the
# lazily-created pg_temp schema, dropped at session end / detach)
_TEMP_TABLE_RE = re.compile(
    rf"^(\s*CREATE\s+(?:OR\s+REPLACE\s+)?)(?:TEMP|TEMPORARY)\s+TABLE\s+"
    # the (?!IF\s+NOT\s+EXISTS) guard stops backtracking from treating
    # the keyword IF as the table name when the optional group fails
    # ('... IF NOT EXISTS pg_temp.t' must fall through to the
    # qualified rewrite, not become 'pg_temp.IF NOT EXISTS ...')
    rf"((?:IF\s+NOT\s+EXISTS\s+)?)(?!pg_temp\.)(?!IF\s+NOT\s+EXISTS)"
    rf"({_ID})(?!\.)",
    re.IGNORECASE)
# explicit qualifier (CREATE TEMP TABLE pg_temp.t ...): just strip the
# TEMP keyword — the name already routes to the temp namespace
_TEMP_QUALIFIED_RE = re.compile(
    r"^(\s*CREATE\s+(?:OR\s+REPLACE\s+)?)(?:TEMP|TEMPORARY)\s+TABLE\s+"
    r"(?=(?:IF\s+NOT\s+EXISTS\s+)?pg_temp\.)",
    re.IGNORECASE)
_CTAS_RE = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
    rf"{_QIDENT}\s+AS\s+(SELECT\s+.+?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_CREATE_SCHEMA_RE = re.compile(
    rf"^\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?{_IDENT};?\s*$",
    re.IGNORECASE)
_DROP_SCHEMA_RE = re.compile(
    rf"^\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?{_IDENT}\s*(CASCADE)?;?\s*$",
    re.IGNORECASE)
_CREATE_VIEW_RE = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+{_IDENT}\s+AS\s+(SELECT\s+.+?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_VIEW_RE = re.compile(
    rf"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?{_IDENT};?\s*$", re.IGNORECASE)
_CREATE_TABLE_RE = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
    rf"{_QIDENT}\s*\((.+)\);?\s*$",
    re.IGNORECASE | re.DOTALL)
_ALTER_ADD_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_QIDENT}\s+ADD\s+(?:COLUMN\s+)?{_IDENT}\s+([\w(), ]+?);?\s*$",
    re.IGNORECASE)
_ALTER_RENAME_TABLE_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_QIDENT}\s+RENAME\s+TO\s+{_IDENT};?\s*$",
    re.IGNORECASE)
_ALTER_RENAME_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_QIDENT}\s+RENAME\s+(?:COLUMN\s+)?{_IDENT}\s+TO\s+{_IDENT};?\s*$",
    re.IGNORECASE)
_ALTER_DROP_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_QIDENT}\s+DROP\s+(?:COLUMN\s+)?{_IDENT};?\s*$",
    re.IGNORECASE)
_CREATE_INDEX_RE = re.compile(
    rf"^\s*CREATE\s+INDEX\s+(?:{_ID}\s+)?ON\s+{_QIDENT}\s*\(\s*{_IDENT}\s*\);?\s*$",
    re.IGNORECASE)


_CONSTRAINT_KW = re.compile(
    r"\s+(NOT\s+NULL|NULL\b|PRIMARY\s+KEY|UNIQUE\b|CHECK\s*\(|DEFAULT\s+|"
    r"REFERENCES\s+)", re.IGNORECASE)


def _search_outside_quotes(pattern: re.Pattern, text: str):
    """First regex match whose start lies OUTSIDE single-quoted SQL
    string literals — a DEFAULT like 'no default given' must not be
    split at the ' default ' inside the literal."""
    pos = 0
    while True:
        m = pattern.search(text, pos)
        if m is None:
            return None
        if text.count("'", 0, m.start()) % 2 == 0:
            return m
        pos = m.start() + 1


def _split_top_commas(text: str) -> list[str]:
    """Split on commas outside parens AND outside single-quoted
    string literals ('' is the SQL escape for a quote)."""
    parts, cur, depth, inq = [], [], 0, False
    for ch in text:
        if ch == "'":
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not inq:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _balanced_paren(text: str) -> tuple[str, str]:
    """text starts at '('; return (inner, rest-after-close).
    Parens inside single-quoted literals don't count."""
    depth, inq = 0, False
    for i, ch in enumerate(text):
        if ch == "'":
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return text[1:i], text[i + 1:]
    raise ValueError(f"unbalanced parens in {text!r}")


def _parse_merge(sql: str):
    """Parse a MERGE statement into (table, source_sql, keys, upd, ins)
    or return None if `sql` is not a MERGE. The USING source is read
    with balanced-paren scanning so subqueries containing JOIN .. ON
    survive; the ON clause must be a conjunction of same-named
    equality columns (t.k = s.k [AND ...]) — OR and non-equality
    predicates are REJECTED rather than silently dropped."""
    m = _MERGE_PREFIX_RE.match(sql)
    if not m:
        return None
    table = m.group(1)
    rest = sql[m.end():].lstrip()
    if rest.startswith("("):
        src_sql, rest = _balanced_paren(rest)
    else:
        im = re.match(_ID, rest)
        if not im:
            raise ValueError("MERGE: cannot parse USING source")
        src_sql, rest = f"SELECT * FROM {im.group(0)}", rest[im.end():]
    # optional [AS] alias before ON
    rest = re.sub(rf"^\s*(?:AS\s+)?{_ID}\s+(?=ON\s)", "", rest.lstrip(),
                  flags=re.IGNORECASE)
    cm = _MERGE_CLAUSES_RE.match(rest.lstrip())
    if not cm:
        raise ValueError(
            "MERGE: expected ON <cond> followed by WHEN MATCHED THEN "
            "UPDATE SET * and/or WHEN NOT MATCHED THEN INSERT *")
    on_clause, upd, ins = cm.group(1), bool(cm.group(2)), bool(cm.group(3))
    if not (upd or ins):
        raise ValueError(
            "MERGE needs WHEN MATCHED THEN UPDATE SET * and/or "
            "WHEN NOT MATCHED THEN INSERT *")
    keys = []
    for part in re.split(r"\s+AND\s+", on_clause.strip(),
                         flags=re.IGNORECASE):
        pm = re.fullmatch(
            rf"\s*{_ID}\.({_ID})\s*=\s*{_ID}\.({_ID})\s*", part)
        if not pm or _unquote(pm.group(1)) != _unquote(pm.group(2)):
            raise ValueError(
                f"MERGE ON must be equality conjunctions on same-named "
                f"columns (t.k = s.k [AND ...]); cannot route {part!r}")
        keys.append(_unquote(pm.group(1)))
    return table, src_sql, keys, upd, ins


def _parse_col_constraints(name: str, tail: str, meta: dict) -> None:
    """Scan a column definition's constraint tail: NOT NULL, PRIMARY
    KEY, UNIQUE, CHECK(expr), DEFAULT expr (reference:
    attach_constraints.test, attach_defaults.test)."""
    while tail:
        tail = tail.strip()
        if not tail:
            break
        up = tail.upper()
        if up.startswith("NOT"):
            meta.setdefault("not_null", []).append(name)
            tail = re.sub(r"^NOT\s+NULL", "", tail, flags=re.IGNORECASE)
            continue
        if up.startswith("NULL"):
            tail = tail[4:]
            continue
        if up.startswith("PRIMARY"):
            meta.setdefault("keys", []).append([name])
            meta.setdefault("not_null", []).append(name)
            tail = re.sub(r"^PRIMARY\s+KEY", "", tail, flags=re.IGNORECASE)
            continue
        if up.startswith("UNIQUE"):
            meta.setdefault("keys", []).append([name])
            tail = tail[6:]
            continue
        if up.startswith("CHECK"):
            after = tail[5:].lstrip()
            inner, tail = _balanced_paren(after)
            meta.setdefault("checks", []).append(inner.strip())
            continue
        if up.startswith("DEFAULT"):
            after = tail[7:].lstrip()
            m = _search_outside_quotes(_CONSTRAINT_KW, after)
            expr, tail = (after[:m.start()], after[m.start():]) if m \
                else (after, "")
            meta.setdefault("defaults", {})[name] = expr.strip()
            continue
        if up.startswith("REFERENCES"):
            # FK is catalog-only here (reference records but does not
            # enforce FKs through the scanner either)
            break
        break


def _coldefs_to_schema(coldefs: str):
    """Backwards-compatible wrapper: schema only."""
    return _parse_coldefs(coldefs)[0]


def _parse_coldefs(coldefs: str):
    """'id INT PRIMARY KEY, name VARCHAR(20) DEFAULT ''x''' →
    (StructType, constraint-meta) via the PG type map (reference:
    postgres_table_set.cpp CreateTable DDL path +
    attach_constraints/attach_defaults tests)."""
    from pyspark.sql import types as T
    from .types import pg_type_to_spark
    fields = []
    meta: dict = {}
    for part in _split_top_commas(coldefs):
        up = part.upper()
        if up.startswith("CONSTRAINT"):
            part = re.sub(rf"^CONSTRAINT\s+{_ID}\s+", "", part,
                          flags=re.IGNORECASE)
            up = part.upper()
        if up.startswith("PRIMARY"):
            inner, _ = _balanced_paren(part[part.index("("):])
            cols = [_unquote(c.strip()) for c in inner.split(",")]
            meta.setdefault("keys", []).append(cols)
            meta.setdefault("not_null", []).extend(cols)
            continue
        if up.startswith("UNIQUE"):
            inner, _ = _balanced_paren(part[part.index("("):])
            meta.setdefault("keys", []).append(
                [_unquote(c.strip()) for c in inner.split(",")])
            continue
        if up.startswith("CHECK"):
            inner, _ = _balanced_paren(part[part.index("("):])
            meta.setdefault("checks", []).append(inner.strip())
            continue
        if up.startswith("FOREIGN"):
            continue   # catalog-only
        m = re.match(rf"{_IDENT}\s+(.+)$", part, re.DOTALL)
        name, rest = _unquote(m.group(1)), m.group(2).strip()
        km = _search_outside_quotes(_CONSTRAINT_KW, " " + rest)
        if km:
            typ = rest[: max(km.start() - 1, 0)].strip()
            _parse_col_constraints(name, rest[km.start() - 1:], meta)
        else:
            typ = rest
        prec = scale = None
        pm = re.match(r"([\w ]+?)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$", typ)
        if pm:
            typ = pm.group(1).strip()
            base = typ.lower()
            if base in ("numeric", "decimal"):
                typ = "numeric"
                prec = int(pm.group(2))
                scale = int(pm.group(3) or 0)
            elif base in ("char", "character", "bpchar", "nchar",
                          "varchar", "character varying", "nvarchar"):
                # length is ENFORCED, not advisory (reference:
                # attach_types_char.test:30-33 "value too long" on
                # over-length INSERT). bpchar additionally blank-
                # strips on read — PG pads to n on storage and the
                # reference's scan surfaces the value trailing-space-
                # trimmed, so the store keeps the trimmed form.
                meta.setdefault("char_limits", {})[name] = {
                    "n": int(pm.group(2)),
                    "pad": base in ("char", "character", "bpchar",
                                    "nchar")}
        fields.append(T.StructField(
            name, pg_type_to_spark(typ, precision=prec, scale=scale), True))
    return T.StructType(fields), meta


def _unquote(ident: str) -> str:
    """Strip surrounding double quotes and unescape doubled quotes;
    bare names pass through verbatim (the store is case-preserving,
    like Spark's catalog)."""
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1].replace('""', '"')
    return ident


def _unquote_table(ident: str) -> str:
    """Unquote each dot-separated part of a possibly schema-qualified,
    possibly quoted table reference."""
    parts, cur, inq = [], [], False
    for ch in ident:
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif ch == "." and not inq:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return ".".join(_unquote(p) for p in parts)


def _expand_default_values(store, table: str, values_sql: str,
                           cols: list[str] | None) -> str:
    """Replace bare DEFAULT tokens in a VALUES list with the target
    column's stored DEFAULT expression (attach_describe.test:
    INSERT INTO t VALUES (DEFAULT))."""
    if not re.search(r"\bDEFAULT\b", values_sql, re.IGNORECASE):
        return values_sql
    body = values_sql.strip()[len("VALUES"):].strip()
    target_cols = cols or store.scan(table).columns
    defaults = store.table_meta(table).get("defaults", {})
    out_rows = []
    for r in _split_top_commas(body):
        inner, _ = _balanced_paren(r.strip())
        cells = []
        for i, cell in enumerate(_split_top_commas(inner)):
            if cell.strip().upper() == "DEFAULT":
                col = target_cols[i] if i < len(target_cols) else None
                cells.append(defaults.get(col, "NULL"))
            else:
                cells.append(cell)
        out_rows.append("(" + ", ".join(cells) + ")")
    return "VALUES " + ", ".join(out_rows)


def _split_statements(sql: str) -> list[str]:
    """Split a multi-statement string on semicolons outside quotes
    (reference: postgres_execute ships the whole string to PQexec,
    which executes each statement)."""
    parts, cur, inq = [], [], False
    for ch in sql:
        if ch == "'":
            inq = not inq
        if ch == ";" and not inq:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _split_assignments(set_clause: str) -> dict[str, str]:
    # quote/paren-aware split: SET v = greatest(a, b), s = 'x,y' must
    # not break at the commas inside the call or the literal
    out = {}
    for part in _split_top_commas(set_clause):
        col, _, expr = part.partition("=")
        out[_unquote(col.strip())] = expr.strip()
    return out


def jdbc_execute(jvm, info, sql: str) -> None:
    """Run one statement on a live Postgres over the driver's JDBC
    connection (reference: src/postgres_execute.cpp — a single
    PQexec on the bound connection; no result set).

    Takes the py4j `jvm` gateway as a parameter so the statement
    routing is unit-testable with a fake gateway (no server in this
    container)."""
    props = info.jdbc_properties()
    conn = jvm.java.sql.DriverManager.getConnection(
        info.jdbc_url, props.get("user", ""), props.get("password", ""))
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def pg_execute(catalog: Catalog, alias: str, sql: str) -> None:
    """postgres_execute(db, sql): DDL/DML with no result set.

    reference: src/postgres_execute.cpp — requires write access. For a
    writable attached store, the statement routes to the managed
    store's distributed DML (DELETE/UPDATE = snapshot rewrite, INSERT
    = file append, CTAS/DROP = catalog ops — reference:
    test/sql/storage/attach_delete.test, attach_update.test); anything
    else runs through Spark SQL against the registered views.
    """
    db = catalog.attached[alias]
    if db.read_only:
        raise PermissionError(f"database {alias!r} attached READ_ONLY")
    if db.backend == "jdbc":
        jdbc_execute(catalog.spark._sc._jvm, db.conn, sql)
        return
    if db.backend == "store":
        # postgres_execute accepts multiple ';'-separated statements
        # (reference: postgres_execute_transaction.test)
        sql = _TEMP_TABLE_RE.sub(r"\1TABLE \2pg_temp.\3", sql)
        sql = _TEMP_QUALIFIED_RE.sub(r"\1TABLE ", sql)
        stmts = _split_statements(sql)
        if len(stmts) > 1:
            for s in stmts:
                pg_execute(catalog, alias, s)
            return
        store = db.store
        if re.match(r"^\s*BEGIN(\s+TRANSACTION)?\s*;?\s*$", sql,
                    re.IGNORECASE):
            store.begin()
            return
        if re.match(r"^\s*COMMIT\s*;?\s*$", sql, re.IGNORECASE):
            store.commit()
        elif re.match(r"^\s*ROLLBACK\s*;?\s*$", sql, re.IGNORECASE):
            store.rollback()
        elif re.match(r"^\s*CHECKPOINT(\s+\w+)?\s*;?\s*$", sql,
                      re.IGNORECASE):
            store.checkpoint()
        elif m := re.match(rf"^\s*VACUUM(\s+{_ID})?\s*;?\s*$", sql,
                           re.IGNORECASE):
            store.vacuum(_unquote(m.group(1).strip()) if m.group(1)
                         else None)
        elif m := _COPY_TO_RE.match(sql):
            from .copyio import copy_to
            table, sub, path, fmt = m.groups()
            df = (_pg_sql(catalog.spark, sub) if sub
                  else store.scan(_unquote_table(table)))
            copy_to(df, path, format=_copy_fmt(fmt))
        elif m := _COPY_FROM_RE.match(sql):
            from .copyio import copy_from
            table, path, fmt = m.groups()
            t = _unquote_table(table)
            cur = store.scan(t)
            store.insert(t, copy_from(catalog.spark, path,
                                      format=_copy_fmt(fmt),
                                      schema=cur.schema))
        elif parsed := _parse_merge(sql):
            table, src_sql, keys, upd, ins = parsed
            store.merge(_unquote_table(table),
                        _pg_sql(catalog.spark, src_sql),
                        keys, update_all=upd, insert_all=ins)
        elif m := _TRUNCATE_RE.match(sql):
            store.delete(_unquote_table(m.group(1)), "true")
        elif m := _DELETE_RE.match(sql):
            # no WHERE = whole-table delete (standard SQL). WHERE/SET
            # fragments run through F.expr (Spark's parser) inside the
            # store, so they need the same PG-dialect translation the
            # full-statement paths get
            store.delete(_unquote_table(m.group(1)),
                         _escape_pg_literals(m.group(2))
                         if m.group(2) else "true")
        elif m := _UPDATE_RE.match(sql):
            store.update(_unquote_table(m.group(1)),
                         _escape_pg_literals(m.group(3))
                         if m.group(3) else "true",
                         {k: _escape_pg_literals(v) for k, v in
                          _split_assignments(m.group(2)).items()})
        elif m := _INSERT_RE.match(sql):
            table, collist, src = (_unquote_table(m.group(1)),
                                   m.group(2), m.group(3))
            # explicit column list fills the rest from DEFAULTs
            # (attach_defaults.test); without one INSERT is positional
            cols = ([_unquote(c.strip()) for c in collist.split(",")]
                    if collist else None)
            if src.upper().startswith("VALUES"):
                src = _expand_default_values(store, table, src, cols)
                src = f"SELECT * FROM ({src})"
            df = _pg_sql(catalog.spark, src)
            store.insert(table, df, columns=cols)
        elif m := _CTAS_RE.match(sql):
            store.create_table(_unquote_table(m.group(3)),
                               _pg_sql(catalog.spark, m.group(4)),
                               if_not_exists=bool(m.group(2)),
                               or_replace=bool(m.group(1)))
        elif m := _CREATE_TABLE_RE.match(sql):
            schema, tmeta = _parse_coldefs(m.group(4))
            empty = catalog.spark.createDataFrame([], schema)
            store.create_table(_unquote_table(m.group(3)), empty,
                               if_not_exists=bool(m.group(2)),
                               or_replace=bool(m.group(1)),
                               meta=tmeta or None)
        elif m := _ALTER_ADD_RE.match(sql):
            typ = m.group(3).strip()
            dt = _coldefs_to_schema(f"c {typ}")["c"].dataType
            store.add_column(_unquote_table(m.group(1)),
                             _unquote(m.group(2)), "NULL",
                             dt.simpleString())
        elif m := _ALTER_RENAME_TABLE_RE.match(sql):
            old, new = _unquote_table(m.group(1)), _unquote(m.group(2))
            store.rename_table(old, new)
            catalog.drop_table_views(db, old)
            target = (old.partition(".")[0] + "." + new
                      if "." in old else new)
            catalog.register_table_views(db, target)
        elif m := _ALTER_RENAME_RE.match(sql):
            store.rename_column(_unquote_table(m.group(1)),
                                _unquote(m.group(2)), _unquote(m.group(3)))
        elif m := _ALTER_DROP_RE.match(sql):
            store.drop_column(_unquote_table(m.group(1)),
                              _unquote(m.group(2)))
        elif m := _CREATE_INDEX_RE.match(sql):
            store.create_index(_unquote_table(m.group(1)),
                               _unquote(m.group(2)))
        elif m := _DROP_RE.match(sql):
            dropped = _unquote_table(m.group(2))
            store.drop_table(dropped, if_exists=bool(m.group(1)))
            catalog.drop_table_views(db, dropped)
        elif m := _CREATE_SCHEMA_RE.match(sql):
            store.create_schema(_unquote(m.group(2)),
                                if_not_exists=bool(m.group(1)))
        elif m := _DROP_SCHEMA_RE.match(sql):
            store.drop_schema(_unquote(m.group(2)),
                              if_exists=bool(m.group(1)),
                              cascade=bool(m.group(3)))
        elif m := _CREATE_VIEW_RE.match(sql):
            vname = _unquote(m.group(2))
            # store the TRANSLATED body: scan_view replays it through
            # spark.sql on every read, where raw PG-dialect quoting
            # would misparse (the stored text is Spark SQL by contract
            # of ManagedStore.create_view's Python API)
            store.create_view(vname, _escape_pg_literals(m.group(3)),
                              or_replace=bool(m.group(1)))
            df = store.scan_view(vname, register=False)
            for name in (f"{alias}_{vname}", vname):
                df.createOrReplaceTempView(name)
                if name not in db.views:
                    db.views.append(name)
        elif m := _DROP_VIEW_RE.match(sql):
            vname = _unquote(m.group(2))
            store.drop_view(vname, if_exists=bool(m.group(1)))
            for name in (f"{alias}_{vname}", vname):
                if name in db.views:
                    catalog.spark.catalog.dropTempView(name)
                    db.views.remove(name)
        else:
            _pg_sql(catalog.spark, sql)
        # refresh the registered views to the new snapshot (tracked on
        # the AttachedDatabase so detach() can drop them all);
        # db.table_names() honors a SCHEMA-scoped attach — iterating
        # store.tables() here would leak out-of-schema tables
        for t in db.table_names():
            catalog.register_table_views(db, t)
        # stored views must rebind too: a stale DataFrame pins the OLD
        # snapshot (wrong rows after DML; FileNotFound after a
        # CHECKPOINT/VACUUM garbage-collects its version dir)
        for v in store.views():
            vdf = store.scan_view(v, register=False)
            for name in (f"{alias}_{v}", v):
                vdf.createOrReplaceTempView(name)
                if name not in db.views:
                    db.views.append(name)
        return
    _pg_sql(catalog.spark, sql)


# ---------------------------------------------------------------------
# Session-level SQL: the reference is driven entirely through SQL —
# `ATTACH 'dsn' AS s (TYPE POSTGRES, ...)`, `USE s`, `DETACH s` — so
# the engine accepts the same statements (reference:
# postgres_attach.cpp AttachFunction; test/sql/storage/attach_*.test).
_ATTACH_RE = re.compile(
    rf"^\s*ATTACH\s+(?:DATABASE\s+)?'((?:[^']|'')*)'\s+AS\s+{_IDENT}\s*"
    rf"(?:\(([^()]*)\))?\s*;*\s*$", re.IGNORECASE)
_DETACH_RE = re.compile(
    rf"^\s*DETACH\s+(?:DATABASE\s+)?{_IDENT}\s*;?\s*$", re.IGNORECASE)
_USE_RE = re.compile(rf"^\s*USE\s+{_IDENT}\s*;?\s*$", re.IGNORECASE)
# statements that produce a result set without mutating anything —
# safe on READ_ONLY attaches, routed to pg_query
_READ_STMT_RE = re.compile(
    r"^\s*(?:SELECT|WITH|VALUES|TABLE|DESCRIBE|PRAGMA|SHOW|EXPLAIN|\()",
    re.IGNORECASE)


def _parse_attach_options(opts: str) -> dict:
    """`TYPE POSTGRES, READ_ONLY, SCHEMA 'x'` → kwargs. Unknown or
    malformed options raise ValueError (matching the reference's
    binder errors). Quote-aware split: SCHEMA 'a,b' stays one option."""
    def value_of(o: str) -> str:
        parts = o.split(None, 1)
        if len(parts) < 2 or not parts[1].strip():
            raise ValueError(f"ATTACH option {parts[0]!r} needs a value")
        return parts[1].strip().strip("'\"")

    out: dict = {}
    for o in _split_top_commas(opts):
        up = o.upper()
        if up.startswith("TYPE"):
            typ = value_of(o).upper()
            if typ != "POSTGRES":
                raise ValueError(f"unsupported ATTACH type {typ!r}")
        elif up == "READ_ONLY" or up == "READ_ONLY TRUE":
            out["read_only"] = True
        elif up.startswith("SCHEMA") or up.startswith("SOURCE_SCHEMA"):
            out["schema"] = value_of(o)
        else:
            raise ValueError(f"unknown ATTACH option {o!r}")
    return out


_CALL_ATTACH_RE = re.compile(
    r"^\s*CALL\s+postgres_attach\s*\(\s*'((?:[^']|'')*)'\s*"
    r"(?:,\s*(.*?))?\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_CALL_KWARG_RE = re.compile(
    r"\s*(\w+)\s*(?::?=|=>)\s*(?:'((?:[^']|'')*)'|(\w+))\s*(?:,|$)")


def _call_postgres_attach(catalog: Catalog, dsn: str, argstr: str):
    """`CALL postgres_attach(dsn, ...)` — the reference's table-
    function attach (src/postgres_attach.cpp AttachFunction): list
    the source schema's tables and register one view per table under
    its BARE name (the reference creates them in the sink schema;
    Spark temp views are schema-less, and Catalog.attach already
    registers both alias-prefixed and bare names). Named args map:
    source_schema → attach(schema=...); overwrite=true re-attaches
    (CREATE OR REPLACE VIEW) where the default keeps an existing
    attach (CREATE VIEW IF NOT EXISTS); filter_pushdown and
    sink_schema are accepted — pushdown is always on in the
    connector, and the sink namespace has no Spark equivalent."""
    kwargs: dict = {}
    overwrite = False
    # anchored scan: every byte of the argument list must parse as a
    # name=value pair — a positional or malformed argument raises
    # instead of silently attaching the wrong surface (the same
    # strictness _parse_attach_options applies to ATTACH options)
    pos, matches = 0, []
    argstr = (argstr or "").strip()
    while pos < len(argstr):
        m = _CALL_KWARG_RE.match(argstr, pos)
        if not m:
            raise ValueError(
                f"malformed postgres_attach argument near "
                f"{argstr[pos:pos + 30]!r} — expected name=value")
        matches.append(m)
        pos = m.end()
    for m in matches:
        key = m.group(1).lower()
        val = (m.group(2).replace("''", "'")
               if m.group(2) is not None else m.group(3))
        if key == "source_schema":
            kwargs["schema"] = val
        elif key == "overwrite":
            overwrite = str(val).lower() in ("true", "1", "t")
        elif key in ("sink_schema", "suffix", "filter_pushdown"):
            pass  # accepted for statement parity; no-op here
        else:
            raise ValueError(
                f"unknown postgres_attach argument {key!r}")
    # alias: the dbname from the DSN, the reference's mental model of
    # "the attached postgres database"
    alias = "pg"
    if dm := re.search(r"dbname=([\w-]+)", dsn):
        alias = dm.group(1)
    elif dsn.startswith("duckdb://"):
        import os
        alias = os.path.splitext(os.path.basename(
            dsn[len("duckdb://"):]))[0] or "pg"
    if alias in catalog.attached:
        existing = catalog.attached[alias]
        if not overwrite:
            if existing.source != dsn:
                raise ValueError(
                    f"database {alias!r} is already attached to "
                    f"{existing.source!r}; re-attaching a DIFFERENT "
                    f"source needs overwrite=true")
            return existing                 # VIEW IF NOT EXISTS
        catalog.detach(alias)               # CREATE OR REPLACE VIEW
    db = catalog.attach(dsn, alias=alias, **kwargs)
    if catalog.current is None:
        catalog.current = alias
    return db


def execute_statement(catalog: Catalog, sql: str):
    """Single SQL entry point for session statements: routes
    ATTACH/DETACH/USE here (incl. the reference's CALL
    postgres_attach table function), everything else to `pg_execute`
    against the current database (set by USE, else the sole attached
    one)."""
    if m := _CALL_ATTACH_RE.match(sql):
        return _call_postgres_attach(
            catalog, m.group(1).replace("''", "'"), m.group(2))
    if m := _ATTACH_RE.match(sql):
        source = m.group(1).replace("''", "'")
        alias, opts = _unquote(m.group(2)), m.group(3)
        kwargs = _parse_attach_options(opts or "")
        db = catalog.attach(source, alias=alias, **kwargs)
        if catalog.current is None:
            # first attach becomes current; later attaches do NOT
            # hijack routing away from a database already in use
            catalog.current = alias
        return db
    if m := _DETACH_RE.match(sql):
        catalog.detach(_unquote(m.group(1)))
        return None
    if m := _USE_RE.match(sql):
        alias = _unquote(m.group(1))
        if alias not in catalog.attached:
            raise KeyError(f"no attached database {alias!r}")
        catalog.current = alias
        return None
    current = catalog.current
    if current is None:
        if len(catalog.attached) == 1:
            current = next(iter(catalog.attached))
        else:
            raise ValueError(
                "no current database — run USE <alias> (or attach "
                "exactly one database)")
    # read statements return result sets → pg_query (works on
    # READ_ONLY attaches); DDL/DML routes through pg_execute — a
    # single SQL entry point, like the reference's DuckDB shell
    if _READ_STMT_RE.match(sql):
        return pg_query(catalog, current, sql)
    return pg_execute(catalog, current, sql)
