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


def test_curation_pipeline_journey(spark, sf_dir):
    """The LLM-data-curation journey across operators: the streaming
    router, the compile funnel, and the shard plan must agree with
    each other on the same corpus — cross-operator invariants no
    single-op test checks."""
    from postgres_scanner_spark.functions.analytics import (
        x12_corpus_compile,
    )
    from postgres_scanner_spark.operators.multimodal import (
        m9_shard_repack_plan,
    )
    from postgres_scanner_spark.streaming.events import (
        e18_streaming_quality_router,
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    routed = e18_streaming_quality_router(spark, sf_dir).collect()
    kept_routed = sum(r.n for r in routed if r.route == "kept")
    assert sum(r.n for r in routed) == n_docs

    funnel = x12_corpus_compile(spark, sf_dir).collect()
    assert sum(r.n_raw for r in funnel) == n_docs
    # the funnel applies E18's exact rules after dedup, so its kept
    # column can never exceed the router's kept count, and matches it
    # exactly when dedup dropped nothing
    assert sum(r.n_kept for r in funnel) <= kept_routed
    if sum(r.n_dedup for r in funnel) == n_docs:
        assert sum(r.n_kept for r in funnel) == kept_routed

    shards = m9_shard_repack_plan(spark, sf_dir).collect()
    assert sum(r.n_members for r in shards) == n_docs
    # byte accounting closes: shard bytes sum to the ustar footprint
    total = sum(r.shard_bytes for r in shards)
    assert total >= n_docs * 1024      # ≥ header + 1 data block each
