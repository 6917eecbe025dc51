"""The correctness gate, locally: every queries() entry vs its
DuckDB oracle at sf0.001 (fast; the driver repeats this at sf0.01).
Mirrors SURVEY.md §5."""

import pytest

import __spark_entry__ as entry_mod
from oracle_harness import compare

QS = entry_mod.queries()
OS = entry_mod.oracle_sql()


def test_keys_align():
    assert set(OS) <= set(QS)


@pytest.mark.parametrize("name", sorted(QS))
def test_query_against_oracle(name, spark, sf_dir):
    df = QS[name](spark, sf_dir)
    if name in OS:
        ok, problems = compare(name, df, OS[name], sf_dir, verbose=False)
        assert ok, problems
    else:
        assert df.count() >= 0  # rows-only contract


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


_DUCK_NORM = {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16",
              "TINYINT": "i8", "HUGEINT": "i128", "DOUBLE": "f64",
              "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
              "DATE": "date", "TIMESTAMP": "ts", "BLOB": "bin",
              "TIMESTAMP WITH TIME ZONE": "tstz", "UBIGINT": "u64",
              "VARCHAR[]": "list<str>"}
_SPARK_NORM = {"bigint": "i64", "int": "i32", "smallint": "i16",
               "tinyint": "i8", "double": "f64", "float": "f32",
               "string": "str", "boolean": "bool", "date": "date",
               "timestamp_ntz": "ts", "timestamp": "tstz", "binary": "bin",
               "array<string>": "list<str>"}


@pytest.mark.parametrize("name", sorted(OS))
def test_oracle_types_align(name, spark, sf_dir):
    """The driver's value hash is type-sensitive: an uncast integer
    SUM (Spark BIGINT vs DuckDB HUGEINT) hash-fails even when every
    value matches (round-2 q12/p2/w6 bug class). Pin the normalized
    result schema of both engines for every oracle query."""
    import duckdb
    from oracle_harness import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(OS[name])
    duck = {c: _DUCK_NORM.get(str(t).upper(), str(t).upper())
            for c, t in zip(rel.columns, rel.types)}
    con.close()
    df = QS[name](spark, sf_dir)
    spk = {c: _SPARK_NORM.get(t, t) for c, t in df.dtypes}
    assert spk == duck
