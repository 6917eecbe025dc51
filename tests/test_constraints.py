"""Constraints + DEFAULT on the managed store, through the SQL
router — mirrors reference test/sql/storage/attach_constraints.test
and attach_defaults.test statement-for-statement."""

import os

import pytest

from postgres_scanner_spark.catalog import Catalog
from postgres_scanner_spark.queryfn import pg_execute, pg_query
from postgres_scanner_spark.storage import ConstraintError, ManagedStore


@pytest.fixture()
def db(spark, tmp_path):
    root = str(tmp_path / "store")
    ManagedStore(spark, root)          # create the root dir
    open(os.path.join(root, "_managed_store"), "w").close()
    cat = Catalog(spark)
    cat.attach(root, alias="s1")
    assert cat.attached["s1"].backend == "store"
    return cat


def _rows(cat, sql):
    return sorted((tuple(r) for r in pg_query(cat, "s1", sql).collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


# ---- attach_constraints.test ------------------------------------

@pytest.mark.slow
def test_primary_key(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE test(i INTEGER PRIMARY KEY)")
    pg_execute(db, "s1", "INSERT INTO test VALUES (42)")
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1", "INSERT INTO test VALUES (42)")
    with pytest.raises(ConstraintError, match="not-null"):
        pg_execute(db, "s1", "INSERT INTO test VALUES (NULL)")
    assert _rows(db, "SELECT * FROM test") == [(42,)]


@pytest.mark.slow
def test_unique(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE test2(i INTEGER UNIQUE)")
    pg_execute(db, "s1", "INSERT INTO test2 VALUES (42)")
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1", "INSERT INTO test2 VALUES (42)")
    # NULLs never conflict under UNIQUE
    pg_execute(db, "s1", "INSERT INTO test2 VALUES (NULL)")
    assert _rows(db, "SELECT * FROM test2") == [(42,), (None,)]


@pytest.mark.slow
def test_compound_primary_key(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test3(i INTEGER, j INTEGER, "
               "PRIMARY KEY(i, j))")
    pg_execute(db, "s1", "INSERT INTO test3 VALUES (1, 1)")
    pg_execute(db, "s1", "INSERT INTO test3 VALUES (1, 2)")
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1", "INSERT INTO test3 VALUES (1, 1)")
    assert _rows(db, "SELECT * FROM test3") == [(1, 1), (1, 2)]


def test_check_constraint(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test4(i INTEGER CHECK(i < 100))")
    pg_execute(db, "s1", "INSERT INTO test4 VALUES (42)")
    with pytest.raises(ConstraintError, match="check constraint"):
        pg_execute(db, "s1", "INSERT INTO test4 VALUES (142)")
    assert _rows(db, "SELECT * FROM test4") == [(42,)]


def test_not_null(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test5(i INTEGER NOT NULL)")
    pg_execute(db, "s1", "INSERT INTO test5 VALUES (42)")
    with pytest.raises(ConstraintError, match="not-null"):
        pg_execute(db, "s1", "INSERT INTO test5 VALUES (NULL)")
    assert _rows(db, "SELECT * FROM test5") == [(42,)]


def test_duplicate_inside_one_batch(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE test6(i INTEGER UNIQUE)")
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1",
                   "INSERT INTO test6 SELECT 7 AS i UNION ALL SELECT 7")


# ---- attach_defaults.test ---------------------------------------

def test_defaults(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test(i INTEGER DEFAULT 42, "
               "j INTEGER)")
    pg_execute(db, "s1", "INSERT INTO test (i) VALUES (3)")
    pg_execute(db, "s1", "INSERT INTO test (j) VALUES (84)")
    assert _rows(db, "SELECT * FROM test") == [(3, None), (42, 84)]
    pg_execute(db, "s1", "INSERT INTO test (j, i) VALUES (1, 10)")
    pg_execute(db, "s1", "INSERT INTO test (i, j) VALUES (100, 1000)")
    assert _rows(db, "SELECT * FROM test") == [
        (3, None), (10, 1), (42, 84), (100, 1000)]
    with pytest.raises(ValueError, match='does not have a column with name'):
        pg_execute(db, "s1", "INSERT INTO test (zzz) VALUES (3)")
    with pytest.raises(ValueError, match='Duplicate column name'):
        pg_execute(db, "s1", "INSERT INTO test (j, j, j) VALUES (1, 2, 3)")


def test_default_expression(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE t7(i INTEGER DEFAULT 2 + 3, "
               "s VARCHAR DEFAULT 'hi' NOT NULL)")
    pg_execute(db, "s1", "INSERT INTO t7 (i) VALUES (1)")
    assert _rows(db, "SELECT * FROM t7") == [(1, "hi")]
    store = db.attached["s1"].store
    meta = store.table_meta("t7")
    assert meta["defaults"] == {"i": "2 + 3", "s": "'hi'"}
    assert meta["not_null"] == ["s"]


def test_meta_survives_snapshot_rewrites(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE t8(i INTEGER PRIMARY KEY, "
               "v INTEGER)")
    pg_execute(db, "s1", "INSERT INTO t8 VALUES (1, 10)")
    pg_execute(db, "s1", "UPDATE t8 SET v = 11 WHERE i = 1")
    pg_execute(db, "s1", "DELETE FROM t8 WHERE v > 100")
    # constraint still enforced after rewrites
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1", "INSERT INTO t8 VALUES (1, 12)")
    pg_execute(db, "s1", "INSERT INTO t8 VALUES (2, 20)")
    assert _rows(db, "SELECT * FROM t8") == [(1, 11), (2, 20)]


# ---- attach_describe.test ---------------------------------------

def test_describe_and_table_info(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test9(i BIGINT PRIMARY KEY, "
               "j BIGINT DEFAULT 42)")
    rows = pg_query(db, "s1", "DESCRIBE test9").collect()
    assert [(r.column_name, r.column_type, r.null, r.key, r.default)
            for r in rows] == [
        ("i", "BIGINT", "NO", "PRI", None),
        ("j", "BIGINT", "YES", None, "42")]
    ti = pg_query(db, "s1", "PRAGMA table_info('test9')").collect()
    assert [(r.cid, r.name, r.notnull, r.dflt_value, r.pk)
            for r in ti] == [
        (0, "i", True, None, True), (1, "j", False, "42", False)]


def test_insert_default_keyword(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE test10(s VARCHAR DEFAULT "
               "'hello, '||'world')")
    pg_execute(db, "s1", "INSERT INTO test10 VALUES (DEFAULT)")
    assert _rows(db, "SELECT * FROM test10") == [("hello, world",)]


# ---- attach_schema_param.test -----------------------------------

def test_schema_scoped_attach(spark, tmp_path):
    from postgres_scanner_spark.storage import ManagedStore
    root = str(tmp_path / "store2")
    store = ManagedStore(spark, root)
    store.create_schema("some_schema")
    store.create_table("some_schema.some_table",
                       spark.createDataFrame([("two",)], "val STRING"))
    store.create_table("other_table",
                       spark.createDataFrame([("x",)], "val STRING"))
    cat = Catalog(spark)
    dbh = cat.attach(root, alias="s", schema="some_schema")
    assert dbh.table_names() == ["some_schema.some_table"]
    got = [tuple(r) for r in
           pg_query(cat, "s", "SELECT * FROM some_table").collect()]
    assert got == [("two",)]
    got = [tuple(r) for r in
           pg_query(cat, "s",
                    "SELECT * FROM s_some_schema_some_table").collect()]
    assert got == [("two",)]


# ---- postgres_execute_transaction.test + attach_checkpoint.test --

def test_execute_transaction_roundtrip(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE pea(i INTEGER)")
    pg_execute(db, "s1", "BEGIN")
    pg_execute(db, "s1", "INSERT INTO pea VALUES (42)")
    pg_execute(db, "s1", "ROLLBACK")
    assert _rows(db, "SELECT * FROM pea") == []
    pg_execute(db, "s1", "BEGIN")
    pg_execute(db, "s1",
               "INSERT INTO pea VALUES (42); INSERT INTO pea VALUES (84)")
    pg_execute(db, "s1", "COMMIT")
    assert _rows(db, "SELECT * FROM pea") == [(42,), (84,)]


def test_checkpoint_compacts_versions(db):
    import os as _os
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE ck(i INTEGER)")
    pg_execute(db, "s1", "INSERT INTO ck VALUES (1)")
    pg_execute(db, "s1", "INSERT INTO ck VALUES (2)")
    pg_execute(db, "s1", "UPDATE ck SET i = 20 WHERE i = 2")
    store = db.attached["s1"].store
    tdir = store._tdir("ck")
    assert len([d for d in _os.listdir(tdir) if d.startswith("v")]) > 1
    pg_execute(db, "s1", "CHECKPOINT")
    vdirs = [d for d in _os.listdir(tdir) if d.startswith("v")]
    assert len(vdirs) == 1
    assert _rows(db, "SELECT * FROM ck") == [(1,), (20,)]


def test_check_constraint_with_paren_literal(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE t11(s VARCHAR CHECK (s <> ')('))")
    pg_execute(db, "s1", "INSERT INTO t11 VALUES ('fine')")
    with pytest.raises(ConstraintError, match="check constraint"):
        pg_execute(db, "s1", "INSERT INTO t11 VALUES (')(')")
    meta = db.attached["s1"].store.table_meta("t11")
    assert meta["checks"] == ["s <> ')('"]


# ---- time travel + VACUUM ---------------------------------------

def test_time_travel_and_vacuum(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE tt(i INTEGER)")
    pg_execute(db, "s1", "INSERT INTO tt VALUES (1)")
    pg_execute(db, "s1", "INSERT INTO tt VALUES (2)")
    pg_execute(db, "s1", "DELETE FROM tt WHERE i = 1")
    store = db.attached["s1"].store
    hist = store.history("tt")
    assert [h["version"] for h in hist] == [0, 1, 2, 3]
    assert hist[-1]["is_current"]
    # v2 (before the delete) still readable
    assert sorted(r.i for r in store.scan_at("tt", 2).collect()) == [1, 2]
    assert [r.i for r in store.scan("tt").collect()] == [2]
    pg_execute(db, "s1", "VACUUM tt")
    assert [h["version"] for h in store.history("tt")] == [3]
    with pytest.raises(ValueError, match="vacuumed or never existed"):
        store.scan_at("tt", 2)
    # current data untouched, no rewrite happened (same version id)
    assert [r.i for r in store.scan("tt").collect()] == [2]


# ---- attach_multi_join.test (federation across attached dbs) ----

def test_join_across_attached_databases(spark, tmp_path, sf_dir):
    """Join a read-only parquet attach against a writable store
    attach in one SQL query — the reference's multi-database
    federation surface (attach_multi_join.test)."""
    from postgres_scanner_spark.storage import ManagedStore
    root = str(tmp_path / "fed_store")
    store = ManagedStore(spark, root)
    store.create_table("region_notes", spark.createDataFrame(
        [(0, "africa note"), (1, "america note")],
        "r_regionkey BIGINT, note STRING"))
    cat = Catalog(spark)
    cat.attach(sf_dir, alias="tpch")
    cat.attach(root, alias="notes")
    got = sorted(tuple(r) for r in spark.sql(
        """SELECT r.r_name, n.note
           FROM tpch_region r JOIN notes_region_notes n
             ON r.r_regionkey = n.r_regionkey
           ORDER BY r.r_name""").collect())
    assert len(got) == 2 and all(note.endswith("note") for _, note in got)
    cat.detach("tpch")
    cat.detach("notes")


# ---- review-fix regressions -------------------------------------

@pytest.mark.slow
def test_update_with_function_call_and_no_where(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE uf(a INT, b INT)")
    pg_execute(db, "s1", "INSERT INTO uf VALUES (1, 5)")
    pg_execute(db, "s1", "INSERT INTO uf VALUES (7, 2)")
    # comma inside the SET expression must not split the assignment
    pg_execute(db, "s1", "UPDATE uf SET a = greatest(a, b) WHERE true")
    assert _rows(db, "SELECT * FROM uf") == [(5, 5), (7, 2)]
    # whole-table forms (no WHERE)
    pg_execute(db, "s1", "UPDATE uf SET b = 0")
    assert _rows(db, "SELECT * FROM uf") == [(5, 0), (7, 0)]
    pg_execute(db, "s1", "DELETE FROM uf")
    assert _rows(db, "SELECT * FROM uf") == []


@pytest.mark.slow
def test_update_enforces_constraints(db):
    pg_execute(db, "s1",
               "CREATE OR REPLACE TABLE uc(i INT PRIMARY KEY, "
               "v INT CHECK (v < 100))")
    pg_execute(db, "s1", "INSERT INTO uc VALUES (1, 10)")
    pg_execute(db, "s1", "INSERT INTO uc VALUES (2, 20)")
    with pytest.raises(ConstraintError, match="not-null"):
        pg_execute(db, "s1", "UPDATE uc SET i = NULL WHERE i = 1")
    with pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(db, "s1", "UPDATE uc SET i = 2 WHERE i = 1")
    with pytest.raises(ConstraintError, match="check constraint"):
        pg_execute(db, "s1", "UPDATE uc SET v = 142 WHERE i = 1")
    pg_execute(db, "s1", "UPDATE uc SET v = 42 WHERE i = 1")
    assert _rows(db, "SELECT * FROM uc") == [(1, 42), (2, 20)]
    with pytest.raises(ValueError, match="does not have a column"):
        pg_execute(db, "s1", "UPDATE uc SET vv = 1 WHERE i = 1")


def test_alter_add_decimal_column(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE ad(i INT)")
    pg_execute(db, "s1", "INSERT INTO ad VALUES (1)")
    pg_execute(db, "s1", "ALTER TABLE ad ADD COLUMN price numeric(10,2)")
    cols = dict((r.column_name, r.column_type) for r in
                pg_query(db, "s1", "DESCRIBE ad").collect())
    assert cols["price"] == "DECIMAL(10,2)"


def test_drop_committed_table_in_txn_rejected(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE dt(i INT)")
    pg_execute(db, "s1", "INSERT INTO dt VALUES (1)")
    pg_execute(db, "s1", "BEGIN")
    with pytest.raises(RuntimeError, match="transaction"):
        pg_execute(db, "s1", "DROP TABLE dt")
    pg_execute(db, "s1", "ROLLBACK")
    assert _rows(db, "SELECT * FROM dt") == [(1,)]


def test_stored_view_tracks_dml_and_checkpoint(db):
    pg_execute(db, "s1", "CREATE OR REPLACE TABLE vb(i INT)")
    pg_execute(db, "s1", "INSERT INTO vb VALUES (1)")
    pg_execute(db, "s1", "INSERT INTO vb VALUES (9)")
    pg_execute(db, "s1", "CREATE VIEW vview AS SELECT i FROM vb WHERE i > 2")
    assert _rows(db, "SELECT * FROM vview") == [(9,)]
    pg_execute(db, "s1", "INSERT INTO vb VALUES (5)")
    # view must see the new snapshot, not the one it was bound to
    assert _rows(db, "SELECT * FROM vview") == [(5,), (9,)]
    pg_execute(db, "s1", "CHECKPOINT")
    # and survive garbage collection of superseded versions
    assert _rows(db, "SELECT * FROM vview") == [(5,), (9,)]


def test_detach_restores_shared_bare_name(spark, tmp_path):
    from postgres_scanner_spark.storage import ManagedStore
    r1, r2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    ManagedStore(spark, r1).create_table(
        "shared", spark.createDataFrame([(1,)], "v INT"))
    ManagedStore(spark, r2).create_table(
        "shared", spark.createDataFrame([(2,)], "v INT"))
    cat = Catalog(spark)
    cat.attach(r1, alias="a")
    cat.attach(r2, alias="b")     # overwrites bare 'shared' with b's
    assert [r.v for r in spark.sql("SELECT * FROM shared").collect()] == [2]
    cat.detach("b")
    # a's binding must be restored, not destroyed
    assert [r.v for r in spark.sql("SELECT * FROM shared").collect()] == [1]
    cat.detach("a")


def test_char_pk_uniqueness_on_normalized_values(spark, tmp_path):
    """bpchar comparison ignores trailing blanks: inserting
    'hello     ' into a CHAR(10) PRIMARY KEY that already holds
    'hello' must be a duplicate-key error (PG rejects it), both
    against stored rows and within one batch."""
    from postgres_scanner_spark.catalog import Catalog
    from postgres_scanner_spark.queryfn import pg_execute
    import pytest as _pytest
    root = str(tmp_path / "store")
    ManagedStore(spark, root)
    import os
    open(os.path.join(root, "_managed_store"), "w").close()
    cat = Catalog(spark)
    cat.attach(root, alias="s")
    pg_execute(cat, "s", "CREATE TABLE cpk(c CHAR(10) PRIMARY KEY)")
    pg_execute(cat, "s", "INSERT INTO cpk VALUES ('hello')")
    with _pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(cat, "s", "INSERT INTO cpk VALUES ('hello     ')")
    with _pytest.raises(ConstraintError, match="duplicate key"):
        pg_execute(cat, "s", "INSERT INTO cpk VALUES ('a'), ('a    ')")
    # distinct-after-trim values still insert fine
    pg_execute(cat, "s", "INSERT INTO cpk VALUES ('world   ')")
    assert cat.attached["s"].store.scan("cpk").count() == 2
    cat.detach("s")
