"""End-to-end journey of a duckdb/postgres_scanner user switching to
this engine — every step is something the reference's own docs/tests
do, driven through the same surfaces (SQL attach, postgres_query,
postgres_execute, COPY binary), finishing with the pipeline operators
the reference does not have.

reference: README usage flow + attach_simple.test,
postgres_query.test, postgres_binary.test, attach_delete.test.
"""

import os

from pyspark.sql import functions as F

from postgres_scanner_spark import (
    Catalog, ManagedStore, copy_from, copy_to, execute_statement,
    pg_query,
)


def test_reference_user_journey(spark, tmp_path, sf_dir):
    cat = Catalog(spark)

    # 1. ATTACH a database and point a second one at the TPC-H data
    #    (reference: ATTACH 'dbname=...' AS s (TYPE POSTGRES))
    root = str(tmp_path / "wh")
    ManagedStore(spark, root)       # init marker → attaches writable
    execute_statement(cat, f"ATTACH '{root}' AS wh (TYPE POSTGRES)")
    cat.attach(sf_dir, alias="src", read_only=True)
    execute_statement(cat, "USE wh")

    # 2. DDL + DML through postgres_execute (attach_delete/update.test)
    execute_statement(cat, "CREATE TABLE hot_parts AS "
                           "SELECT * FROM src_part WHERE p_size > 40")
    n_hot = cat.table("wh", "hot_parts").count()
    assert n_hot > 0
    execute_statement(cat, "DELETE FROM hot_parts WHERE p_retailprice < 910")
    kept = cat.table("wh", "hot_parts").count()
    assert 0 < kept <= n_hot

    # 3. ad-hoc passthrough (postgres_query.test shapes)
    top = pg_query(cat, "wh", "SELECT p_brand, COUNT(*) AS n "
                              "FROM wh_hot_parts GROUP BY p_brand "
                              "ORDER BY n DESC, p_brand LIMIT 3").collect()
    assert len(top) == 3 and top[0].n >= top[-1].n

    # 4. COPY TO/FROM in REAL PGCOPY binary format (postgres_binary.test)
    out = str(tmp_path / "hot.pgcopy")
    copy_to(cat.table("wh", "hot_parts"), out, format="pg_binary")
    assert os.path.getsize(out) > 0
    back = copy_from(spark, out, format="pg_binary",
                     schema=cat.table("wh", "hot_parts").schema)
    assert back.count() == kept
    assert (back.agg(F.sum("p_partkey")).first()[0]
            == cat.table("wh", "hot_parts").agg(F.sum("p_partkey")).first()[0])

    # 5. session temp table scratchpad (attach_temporary_table.test)
    execute_statement(cat, "CREATE TEMP TABLE scratch AS "
                           "SELECT p_partkey FROM wh_hot_parts")
    assert "pg_temp.scratch" in cat.attached["wh"].store.tables()

    # 6. the part the reference can't do: run a pipeline operator over
    #    the attached data in the same session
    from postgres_scanner_spark.operators.dedup import d1_exact_dedup
    dups = d1_exact_dedup(spark, sf_dir)
    assert dups.count() > 0          # planted duplicates found

    # 7. clean exit: DETACH drops views and the temp namespace
    execute_statement(cat, "DETACH wh")
    execute_statement(cat, "DETACH src")   # no leaked views in the session
    assert cat.attached == {}
    assert "pg_temp" not in ManagedStore(spark, root).schemas()
