"""r12 optimization: integer fixed-point money arithmetic in tpch.py.

The TPC-H money aggregates were rewritten from per-row DECIMAL
arithmetic (cast(double→decimal) + Decimal.multiply, i.e. the
JavaBigDecimal path that dominated q1's scan-stage CPU) to exact
integer fixed-point longs with a decimal SUM buffer. These tests pin
the claimed invariants directly against the data and the legacy
expressions, independent of the DuckDB gate:

1. every money column really is an exact 2-decimal value (the
   precondition the rewrite relies on);
2. the new per-row fixed-point expressions equal the legacy decimal
   expressions row-for-row;
3. the new aggregates equal the legacy aggregates bit-for-bit as
   doubles, per group.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _legacy_disc_price():
    dec = F.col("l_extendedprice").cast("decimal(12,2)")
    one_minus = (F.lit(1).cast("decimal(3,2)")
                 - F.col("l_discount").cast("decimal(4,2)"))
    return dec * one_minus


def _legacy_charge():
    one_plus = (F.lit(1).cast("decimal(3,2)")
                + F.col("l_tax").cast("decimal(4,2)"))
    return _legacy_disc_price() * one_plus


def test_money_columns_exact_2dec(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = l.filter(
        (F.col("l_extendedprice")
         != F.round(F.col("l_extendedprice"), 2))
        | (F.col("l_discount") != F.round(F.col("l_discount"), 2))
        | (F.col("l_tax") != F.round(F.col("l_tax"), 2))
        | (F.col("l_quantity") != F.round(F.col("l_quantity"), 0))
    ).count()
    assert bad == 0


def test_money_columns_exact_2dec_all_tables(spark, sf_dir):
    # r13 (ADVICE): money_u is applied beyond lineitem — to
    # o_totalprice, c_acctbal, s_acctbal, p_retailprice and
    # events.value. For negative non-exact inputs floor(x*100+0.5)
    # (half-up toward +inf) diverges from the legacy decimal cast
    # (HALF_UP away from zero), so a testdata regeneration with
    # >2-decimal values must fail HERE, loudly, not silently change
    # results.
    for table, col in [("orders", "o_totalprice"),
                       ("customer", "c_acctbal"),
                       ("supplier", "s_acctbal"),
                       ("part", "p_retailprice"),
                       ("events", "value")]:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        bad = df.filter(F.col(col) != F.round(F.col(col), 2)).count()
        assert bad == 0, (table, col)


def test_rowwise_fixed_point_equals_decimal(spark, sf_dir):
    from postgres_scanner_spark.functions.tpch import (
        _charge_u6, _disc_u4, _u2,
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mism = l.select(
        (_u2("l_extendedprice")
         != (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
         .cast("long")).alias("m1"),
        ((_disc_u4() / F.lit(10 ** 4)).cast("double")
         != _legacy_disc_price().cast("double")).alias("m2"),
        ((_charge_u6() / F.lit(10 ** 6)).cast("double")
         != _legacy_charge().cast("double")).alias("m3"),
    ).filter(F.col("m1") | F.col("m2") | F.col("m3")).count()
    assert mism == 0


def test_q1_aggregates_bitwise_equal_legacy(spark, sf_dir):
    from postgres_scanner_spark.functions.tpch import (
        _charge_u6, _disc_u4, _sum_u, _u2,
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
    new = l.groupBy("l_returnflag", "l_linestatus").agg(
        _sum_u(_u2("l_quantity"), 2).alias("sum_qty"),
        _sum_u(_u2("l_extendedprice"), 2).alias("sum_base_price"),
        _sum_u(_disc_u4(), 4).alias("sum_disc_price"),
        _sum_u(_charge_u6(), 6).alias("sum_charge"),
        (_sum_u(_u2("l_discount"), 2) / F.count("*")).alias("avg_disc"),
    )
    old = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double").alias("sum_base_price"),
        F.sum(_legacy_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(_legacy_charge()).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double")
         / F.count("*")).alias("avg_disc"),
    )
    key = ["l_returnflag", "l_linestatus"]
    rows_new = {tuple(r[k] for k in key): r.asDict() for r in new.collect()}
    rows_old = {tuple(r[k] for k in key): r.asDict() for r in old.collect()}
    assert rows_new.keys() == rows_old.keys()
    for k, rn in rows_new.items():
        ro = rows_old[k]
        for c in ("sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge", "avg_disc"):
            # bit-identical doubles, not approx-equal
            assert rn[c] == ro[c], (k, c, rn[c], ro[c])


def test_q9_amount_fixed_point_equals_decimal(spark, sf_dir):
    from postgres_scanner_spark.functions.tpch import _disc_u4, _u2
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = l.join(p, l.l_partkey == p.p_partkey)
    legacy_cost = (F.lit(0.6).cast("decimal(2,1)")
                   * F.col("p_retailprice").cast("decimal(12,2)")
                   * F.col("l_quantity").cast("decimal(12,2)"))
    new_amount = (_disc_u4()
                  - F.lit(60) * _u2("p_retailprice")
                  * F.col("l_quantity").cast("long"))
    mism = j.select(
        ((new_amount / F.lit(10 ** 4)).cast("double")
         != (_legacy_disc_price() - legacy_cost).cast("double"))
        .alias("m")).filter("m").count()
    assert mism == 0
