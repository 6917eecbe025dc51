"""Managed-store DML + transactions (reference: test/sql/storage/
attach_delete.test, attach_update.test, attach_transactions.test)."""

import pytest

from postgres_scanner_spark.storage import ManagedStore
from postgres_scanner_spark.copyio import copy_from, copy_to


@pytest.fixture()
def store(spark, tmp_path):
    return ManagedStore(spark, str(tmp_path / "store"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, name STRING, v DOUBLE")


def test_create_insert_scan(spark, store):
    store.create_table("t", _mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    assert store.scan("t").count() == 2
    store.insert("t", _mk(spark, [(3, "c", 3.0)]))
    assert sorted(r.id for r in store.scan("t").collect()) == [1, 2, 3]
    assert store.tables() == ["t"]


def test_create_if_exists(spark, store):
    store.create_table("t", _mk(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError):
        store.create_table("t", _mk(spark, [(9, "z", 0.0)]))
    store.create_table("t", _mk(spark, [(9, "z", 0.0)]), if_not_exists=True)
    assert store.scan("t").count() == 1


def test_delete(spark, store):
    store.create_table("t", _mk(spark, [(i, "x", float(i)) for i in range(10)]))
    n = store.delete("t", "id >= 7")
    assert n == 3
    assert store.scan("t").count() == 7


def test_update(spark, store):
    store.create_table("t", _mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    n = store.update("t", "id = 2", {"v": "v * 10", "name": "'bb'"})
    assert n == 1
    row = {r.id: r for r in store.scan("t").collect()}
    assert row[2].v == 20.0 and row[2].name == "bb"
    assert row[1].v == 1.0 and row[1].name == "a"


def test_transaction_commit_rollback(spark, store):
    store.create_table("t", _mk(spark, [(1, "a", 1.0)]))
    store.begin()
    store.insert("t", _mk(spark, [(2, "b", 2.0)]))
    assert store.scan("t").count() == 2       # visible inside txn
    store.rollback()
    assert store.scan("t").count() == 1       # rolled back
    store.begin()
    store.insert("t", _mk(spark, [(3, "c", 3.0)]))
    store.commit()
    assert store.scan("t").count() == 2       # committed


def test_drop(spark, store):
    store.create_table("t", _mk(spark, [(1, "a", 1.0)]))
    store.drop_table("t")
    assert store.tables() == []
    with pytest.raises(ValueError):
        store.drop_table("t")
    store.drop_table("t", if_exists=True)


def test_copy_roundtrip(spark, tmp_path):
    df = _mk(spark, [(1, "a", 1.5), (2, "b", 2.5)])
    p = str(tmp_path / "unload")
    copy_to(df, p, format="binary")
    back = copy_from(spark, p, format="binary")
    assert sorted((r.id, r.name, r.v) for r in back.collect()) == \
        [(1, "a", 1.5), (2, "b", 2.5)]
    p2 = str(tmp_path / "unload_text")
    copy_to(df, p2, format="text")
    back2 = copy_from(spark, p2, format="text", schema=df.schema)
    assert back2.count() == 2


def test_catalog_attach(spark, sf_dir):
    from postgres_scanner_spark.catalog import Catalog
    cat = Catalog(spark)
    cat.attach(sf_dir, alias="tpch")
    assert "lineitem" in cat.list_tables("tpch")
    assert cat.table("tpch", "region").count() == 5
    assert cat.database_size("tpch") > 0
    # postgres_query passthrough on the attached alias
    from postgres_scanner_spark.queryfn import pg_query
    n = pg_query(cat, "tpch", "SELECT COUNT(*) AS n FROM tpch_orders").collect()[0].n
    assert n > 0
    cat.clear_cache()
    cat.detach("tpch")


def test_null_byte_replacement(spark, tmp_path):
    from postgres_scanner_spark.settings import SETTINGS
    df = spark.createDataFrame([(1, "a\x00b")], "id BIGINT, s STRING")
    SETTINGS.set("pg_null_byte_replacement", "?")
    try:
        p = str(tmp_path / "nul")
        copy_to(df, p, format="binary")
        back = copy_from(spark, p, format="binary")
        assert back.collect()[0].s == "a?b"
    finally:
        SETTINGS.pg_null_byte_replacement = None


def test_attach_store_sql_dml(spark, tmp_path):
    """SQL-driven DML on an attached writable store (reference:
    attach_delete.test / attach_update.test / attach_insert semantics
    driven through postgres_execute)."""
    from postgres_scanner_spark.catalog import Catalog
    from postgres_scanner_spark.queryfn import pg_execute, pg_query
    root = str(tmp_path / "storedb")
    seed = ManagedStore(spark, root)
    seed.create_table("accounts", _mk(spark, [
        (1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)]))
    cat = Catalog(spark)
    cat.attach(root, alias="db")
    assert cat.attached["db"].backend == "store"
    assert cat.list_tables("db") == ["accounts"]

    pg_execute(cat, "db", "DELETE FROM accounts WHERE id = 2")
    assert cat.table("db", "accounts").count() == 2

    pg_execute(cat, "db", "UPDATE accounts SET v = v + 5 WHERE id = 1")
    vals = {r.id: r.v for r in cat.table("db", "accounts").collect()}
    assert vals[1] == 15.0 and vals[3] == 30.0

    pg_execute(cat, "db",
               "INSERT INTO accounts VALUES (4, 'dan', 40.0)")
    assert cat.table("db", "accounts").count() == 3

    pg_execute(cat, "db",
               "CREATE TABLE rich AS SELECT * FROM db_accounts WHERE v > 20")
    assert sorted(r.id for r in cat.table("db", "rich").collect()) == [3, 4]

    # view refresh: SQL sees the new snapshot
    n = pg_query(cat, "db", "SELECT COUNT(*) AS n FROM db_accounts").collect()[0].n
    assert n == 3

    pg_execute(cat, "db", "DROP TABLE IF EXISTS rich")
    assert cat.list_tables("db") == ["accounts"]

    # read-only attach refuses writes
    cat2 = Catalog(spark)
    cat2.attach(root, alias="ro", read_only=True, register_views=False)
    with pytest.raises(PermissionError):
        pg_execute(cat2, "ro", "DELETE FROM accounts WHERE id = 1")


def test_alter_and_index(spark, store):
    """ALTER TABLE add/rename/drop column + CREATE INDEX clustering
    (reference: attach_alter.test, attach_create_index.test)."""
    store.create_table("t", _mk(spark, [(i, "x", float(i)) for i in range(20)]))
    store.add_column("t", "doubled", "v * 2", "double")
    assert store.scan("t").filter("doubled = v * 2").count() == 20
    store.rename_column("t", "doubled", "v2")
    assert "v2" in store.scan("t").columns
    store.drop_column("t", "v2")
    assert "v2" not in store.scan("t").columns
    store.create_index("t", "id")
    assert store.scan("t").count() == 20  # clustering preserves data
