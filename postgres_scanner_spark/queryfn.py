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
    return catalog.spark.sql(sql)


def pg_execute(catalog: Catalog, alias: str, sql: str) -> None:
    """postgres_execute(db, sql): DDL/DML with no result set.

    reference: src/postgres_execute.cpp — requires write access.
    """
    db = catalog.attached[alias]
    if db.read_only:
        raise PermissionError(f"database {alias!r} attached READ_ONLY")
    if db.backend == "jdbc":
        raise NotImplementedError(
            "JDBC execute needs a live server (py4j DriverManager path)")
    catalog.spark.sql(sql)
