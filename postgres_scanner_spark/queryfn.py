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
    db = catalog.attached[alias]
    sql = sql.strip().rstrip(";")
    if db.backend == "jdbc":
        info = db.conn
        return catalog.spark.read.jdbc(
            info.jdbc_url, f"({sql}) AS pg_query_subq",
            properties=info.jdbc_properties())
    if db.backend == "duckdb":
        # true passthrough: the attached engine executes the SQL; Spark
        # scans the Arrow result (reference: PostgresQueryBind runs the
        # text on the PG side and streams the result set)
        import duckdb
        con = duckdb.connect(db.source[len("duckdb://"):], read_only=True)
        tbl = con.execute(sql).arrow()
        con.close()
        return catalog.spark.createDataFrame(tbl.to_pandas())
    return catalog.spark.sql(sql)


import re

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?);?\s*$",
    re.IGNORECASE | re.DOTALL)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s+(SELECT\s+.+?|VALUES\s*\(.+?\));?\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+);?\s*$", re.IGNORECASE)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(SELECT\s+.+?);?\s*$",
    re.IGNORECASE | re.DOTALL)


def _split_assignments(set_clause: str) -> dict[str, str]:
    # split on top-level commas (no nesting expected in SET lists here)
    out = {}
    for part in set_clause.split(","):
        col, _, expr = part.partition("=")
        out[col.strip()] = expr.strip()
    return out


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
        raise NotImplementedError(
            "JDBC execute needs a live server (py4j DriverManager path)")
    if db.backend == "store":
        store = db.store
        if m := _DELETE_RE.match(sql):
            store.delete(m.group(1), m.group(2))
        elif m := _UPDATE_RE.match(sql):
            store.update(m.group(1), m.group(3),
                         _split_assignments(m.group(2)))
        elif m := _INSERT_RE.match(sql):
            table, src = m.group(1), m.group(2)
            if src.upper().startswith("VALUES"):
                src = f"SELECT * FROM ({src})"
            df = catalog.spark.sql(src)
            # SQL INSERT without a column list is positional
            df = df.toDF(*store.scan(table).columns)
            store.insert(table, df)
        elif m := _CTAS_RE.match(sql):
            store.create_table(m.group(2), catalog.spark.sql(m.group(3)),
                               if_not_exists=bool(m.group(1)))
        elif m := _DROP_RE.match(sql):
            store.drop_table(m.group(2), if_exists=bool(m.group(1)))
        else:
            catalog.spark.sql(sql)
        # refresh the registered views to the new snapshot
        for t in store.tables():
            store.scan(t).createOrReplaceTempView(f"{alias}_{t}")
            store.scan(t).createOrReplaceTempView(t)
        return
    catalog.spark.sql(sql)
