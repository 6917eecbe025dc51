"""Scan-semantics parity queries.

Each mirrors a reference scanner test (reference: test/sql/scanner/*
and test/sql/storage/*): count(*) scans, NULL handling, decimal
arithmetic, every pushdown operator, array/list columns, interval
math, timestamp parts, json extraction, uuid-shaped strings, and a
full-table verification checksum. All are oracle-checked against
DuckDB on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import money_u as _money_u, sum_money as _sum_money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .. import tables
    return tables.load(spark, sf_dir, name)


# ---- P1: count(*) (reference: test/sql/scanner/count_star.test)
def p1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


_P1_SQL = "SELECT COUNT(*) AS n FROM lineitem"


# ---- P2: NULL semantics (reference: test/sql/scanner/nulls.test)
def p2_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    zero_disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        l.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"),
             F.count(zero_disc).alias("nonzero_disc"),
             F.sum(F.when(F.col("l_discount") == 0.0, 1).otherwise(0)).alias("zero_disc"),
             F.count(F.when(zero_disc.isNull(), 1)).alias("null_marks"))
        .orderBy("l_returnflag")
    )


_P2_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       COUNT(NULLIF(l_discount, 0.0)) AS nonzero_disc,
       CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_disc,
       COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 END) AS null_marks
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---- P3: decimal arithmetic (reference: test/sql/scanner/decimals.test)
def p3_decimals(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    tax_amt_u4 = _money_u("l_extendedprice") * _money_u("l_tax")
    return (
        l.groupBy("l_linestatus")
        .agg(_sum_money(tax_amt_u4, 4).alias("sum_tax_amt"),
             _sum_money(_money_u("l_tax"), 2).alias("sum_tax"),
             (F.max(_money_u("l_extendedprice")).cast("decimal(38,0)")
              / 100).cast("double").alias("max_price"))
        .orderBy("l_linestatus")
    )


_P3_SQL = """
SELECT l_linestatus,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS sum_tax_amt,
  CAST(CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS sum_tax,
  CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


# ---- P4: every pushdown operator (reference: attach_filter_pushdown.test,
#      src/postgres_filter_pushdown.cpp)
def p4_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_size") >= 5) & (F.col("p_size") <= 45)
        & (F.col("p_size") != 13)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#7", "Brand#19")
        & F.col("p_name").like("%o%")
        & F.col("p_type").isNotNull()
        & ((F.col("p_retailprice") > 500.0) | (F.col("p_size") < 10))
    )
    return p.filter(cond).agg(
        F.count("*").alias("n"),
        _sum_money(_money_u("p_retailprice"), 2).alias("sum_price"),
        F.min("p_partkey").alias("min_key"),
        F.max("p_partkey").alias("max_key"))


_P4_SQL = """
SELECT COUNT(*) AS n,
       CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
       MIN(p_partkey) AS min_key, MAX(p_partkey) AS max_key
FROM part
WHERE p_size >= 5 AND p_size <= 45 AND p_size <> 13
  AND p_brand IN ('Brand#1','Brand#2','Brand#7','Brand#19')
  AND p_name LIKE '%o%'
  AND p_type IS NOT NULL
  AND (p_retailprice > 500.0 OR p_size < 10)
"""


# ---- P5: array/list scan (reference: test/sql/scanner/arrays.test)
def p5_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return (
        e.select("vec_id", F.size("embedding").alias("dim"),
                 F.posexplode("embedding").alias("pos0", "val_f"))
        .filter(F.col("pos0") < 3)
        .select("vec_id", (F.col("pos0") + 1).cast("long").alias("pos"),
                F.col("val_f").cast("double").alias("val"), "dim")
        .orderBy("vec_id", "pos")
    )


_P5_SQL = """
SELECT vec_id, i + 1 AS pos, CAST(embedding[i+1] AS DOUBLE) AS val,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings, (SELECT unnest(range(3)) AS i)
WHERE vec_id < 10
ORDER BY vec_id, pos
"""


# ---- P6: interval arithmetic (reference: test/sql/scanner/interval.test)
def p6_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.expr("l_shipdate + interval 30 days")
                 < F.lit("1997-01-01").cast("timestamp"))
        .withColumn("ship_month", F.date_format(
            F.expr("l_shipdate + interval 15 days"), "yyyy-MM"))
        .groupBy("ship_month")
        .agg(F.count("*").alias("n"))
        .orderBy("ship_month")
    )


_P6_SQL = """
SELECT strftime(l_shipdate + INTERVAL 15 DAY, '%Y-%m') AS ship_month,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate + INTERVAL 30 DAY < TIMESTAMP '1997-01-01'
GROUP BY ship_month ORDER BY ship_month
"""


# ---- P7: timestamp parts (reference: attach_types_timestamp.test)
def p7_timestamp_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
            F.dayofmonth("o_orderdate").cast("int").alias("d"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")),
                          "yyyy-MM-dd").alias("month_start"))
        .groupBy("y", "m", "month_start")
        .agg(F.count("*").alias("n"), F.max("d").alias("max_day"))
        .orderBy("y", "m")
    )


_P7_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       COUNT(*) AS n, MAX(CAST(day(o_orderdate) AS INT)) AS max_day
FROM orders GROUP BY y, m, month_start ORDER BY y, m
"""


# ---- P8: json extraction (reference: attach_json.test)
def p8_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k_bucket", k % 10)
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"),
             _sum_money(_money_u("value"), 2).alias("sum_value"))
        .orderBy("k_bucket")
    )


_P8_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY k_bucket ORDER BY k_bucket
"""


# ---- P9: uuid-shaped identity (reference: README uuids example,
#      attach_types_uuid.test)
def p9_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    uuid = F.concat_ws("-", F.substring(h, 1, 8), F.substring(h, 9, 4),
                       F.substring(h, 13, 4), F.substring(h, 17, 4),
                       F.substring(h, 21, 12))
    return d.select(uuid.alias("u")).agg(
        F.count("*").alias("n"),
        F.countDistinct("u").alias("n_distinct"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"))


_P9_SQL = """
WITH u AS (
  SELECT substr(h,1,8)||'-'||substr(h,9,4)||'-'||substr(h,13,4)||'-'
         ||substr(h,17,4)||'-'||substr(h,21,12) AS u
  FROM (SELECT md5(CAST(doc_id AS VARCHAR)) AS h FROM documents))
SELECT COUNT(*) AS n, COUNT(DISTINCT u) AS n_distinct,
       MIN(u) AS min_u, MAX(u) AS max_u
FROM u
"""


# ---- P10: full-table verification checksum
#      (reference: attach_verify_big_table.test_slow)
def p10_verify_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_orderkey") * F.col("l_linenumber")).alias("sum_ok_ln"),
        F.sum(F.col("l_partkey") + F.col("l_suppkey")).alias("sum_pk_sk"),
        _sum_money(_money_u("l_quantity"), 2).alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"))


_P10_SQL = """
SELECT COUNT(*) AS n,
       CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS sum_ok_ln,
       CAST(SUM(l_partkey + l_suppkey) AS BIGINT) AS sum_pk_sk,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
"""


# ---- P11: composite/struct columns — nested field access + pruning
#      (reference: attach_types_struct.test,
#      attach_types_complex_composite.test — composites map to
#      STRUCTs through the connector; this exercises the engine side:
#      nested construction, dotted field access, and Catalyst's
#      nested-schema pruning so a rec.metrics.qty aggregation never
#      materializes the sibling fields)
def p11_struct_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    rec = F.struct(
        F.col("l_returnflag").alias("flag"),
        F.struct(
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("l_extendedprice").cast("double").alias("price"),
        ).alias("metrics"))
    return (
        l.select(rec.alias("rec"))
        .groupBy(F.col("rec.flag").alias("flag"))
        .agg(F.count("*").alias("n"),
             _sum_money(_money_u(F.col("rec.metrics.qty")), 2)
             .alias("sum_qty"),
             F.max(F.col("rec.metrics.price")).alias("max_price"))
        .orderBy("flag")
    )


_P11_SQL = """
WITH s AS (
  SELECT {'flag': l_returnflag,
          'metrics': {'qty': CAST(l_quantity AS DOUBLE),
                      'price': CAST(l_extendedprice AS DOUBLE)}} AS rec
  FROM lineitem)
SELECT rec.flag AS flag, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(rec.metrics.qty AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS sum_qty,
       MAX(rec.metrics.price) AS max_price
FROM s GROUP BY flag ORDER BY flag
"""


# ---- P12: bytea/BLOB semantics (reference: attach_types_blob.test —
#      bytea round-trips as BLOB; here: binary construction, length,
#      slicing, and hashing over a binary column, all JVM-side)
def p12_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return (
        d.select(
            "doc_id",
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("payload_md5"),
            F.upper(F.hex(F.substring(payload, 1, 4))).alias("head_hex"))
        .orderBy("doc_id")
    )


# DuckDB cannot slice/md5 BLOBs directly; the corpus is ASCII so
# bytes == characters and the VARCHAR forms are byte-equivalent
_P12_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       upper(hex(encode(substr(text, 1, 4)))) AS head_hex
FROM documents ORDER BY doc_id
"""


# ---- P13: range arrays in PG text form (reference: test/sql/
# scanner/daterange_array.test — ranges surface as their canonical
# '[lo,hi)' strings, here carried through ARRAY columns: build one
# daterange per order as PG renders it, aggregate per priority into
# a sorted-distinct array, and read elements back out of it)
def p13_range_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    rng = F.concat(
        F.lit("["), d.cast("string"), F.lit(","),
        F.date_add(d, 30).cast("string"), F.lit(")"))
    return (
        o.filter(F.col("o_orderdate") < F.lit("1992-03-01").cast("date"))
        .groupBy("o_orderpriority")
        .agg(F.sort_array(F.array_distinct(F.collect_list(rng)))
             .alias("ranges"))
        .select(
            "o_orderpriority",
            F.size("ranges").alias("n_ranges"),
            F.element_at("ranges", 1).alias("first_range"),
            F.element_at("ranges", -1).alias("last_range"),
            "ranges")
        .orderBy("o_orderpriority")
    )


_P13_SQL = """
SELECT o_orderpriority,
       CAST(len(ranges) AS INT) AS n_ranges,
       ranges[1] AS first_range,
       ranges[len(ranges)] AS last_range,
       ranges
FROM (
  SELECT o_orderpriority,
         list_sort(list_distinct(list(
           '[' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ',' ||
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) || ')'))) AS ranges
  FROM orders
  WHERE o_orderdate < DATE '1992-03-01'
  GROUP BY o_orderpriority)
ORDER BY o_orderpriority
"""


# ---- P14: timezone conversion parity (AT TIME ZONE semantics) --------
_P14_ZONES = ("America/New_York", "Asia/Tokyo", "Europe/Berlin",
              "Australia/Adelaide")


def p14_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `AT TIME ZONE` semantics through both engines: event
    timestamps (UTC instants) rendered in four IANA zones — including
    a half-hour-offset zone (Adelaide, +10:30 in January) — rolled up
    by LOCAL hour-of-day. Spark's from_utc_timestamp and DuckDB's
    timezone(zone, timezone('UTC', ts)) must agree on every bucket;
    both read the IANA tzdb, so this pins that the session/JVM/ICU
    zone plumbing is wired identically (the classic silent-skew trap
    when one side treats naive timestamps as local).

    Scale: per-row zone conversion is codegen'd; one (zone, hour)
    aggregate — 4×24 output rows regardless of volume."""
    e = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    parts = [
        e.select(F.lit(z).alias("zone"),
                 F.hour(F.from_utc_timestamp(ts, z)).cast("int")
                 .alias("local_hour"))
        for z in _P14_ZONES
    ]
    allz = parts[0]
    for p in parts[1:]:
        allz = allz.unionByName(p)
    return (allz.groupBy("zone", "local_hour")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("zone", "local_hour"))


_P14_SQL = " UNION ALL ".join(
    f"""SELECT '{z}' AS zone,
       CAST(hour(timezone('{z}', timezone('UTC', ts))) AS INT)
         AS local_hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2""" for z in _P14_ZONES
) + " ORDER BY zone, local_hour"


# ---- P15: bucketed-table co-located join (exchange-free SMJ) ---------
_P15_BUCKETS = 16
import threading as _threading
_P15_LOCK = _threading.Lock()


def p15_bucketed_colocated_join(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """The storage-layout join the 100 TB design depends on: orders
    and lineitem written ONCE as Hive-bucketed tables (bucketBy(16,
    orderkey) + sortBy), so every subsequent orderkey join is
    CO-LOCATED — the planner reads the catalog's bucket spec and
    feeds the SortMergeJoin directly from the bucketed scans with NO
    shuffle exchange on either side (pinned by test: zero
    `hashpartitioning(o_orderkey/l_orderkey)` exchanges in the
    executed plan; the only exchange left is the final tiny
    per-priority aggregate). At lake scale this is the difference
    between re-shuffling 100 TB per join and paying the shuffle once
    at write time — the same contract as the reference's clustered
    storage, expressed through Spark's native bucketing (the brief's
    `repartition()/bucketing for co-located joins` axis, exercised
    nowhere else in the registry).

    Staging is once per (sf_dir, mtime) into /tmp-backed EXTERNAL
    tables under the in-memory catalog; gate workers are THREADS of
    one pid, so a plain lock serializes the create (the m13 spool
    race class). Values are decimal-cast sums (q1's idiom) — the
    bucketing changes the PLAN, never the numbers, which is exactly
    what the oracle grades."""
    import hashlib
    import os
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:8]
    to, tl = f"p15_orders_{key}", f"p15_lineitem_{key}"
    with _P15_LOCK:
        if not spark.catalog.tableExists(to):
            path = f"/tmp/pg_spark_bktstage_{key}"
            (_t(spark, sf_dir, "orders")
             .select("o_orderkey", "o_orderpriority")
             .write.mode("overwrite").option("path", f"{path}/o")
             .bucketBy(_P15_BUCKETS, "o_orderkey")
             .sortBy("o_orderkey").saveAsTable(to))
            (_t(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_quantity")
             .write.mode("overwrite").option("path", f"{path}/l")
             .bucketBy(_P15_BUCKETS, "l_orderkey")
             .sortBy("l_orderkey").saveAsTable(tl))
    o, l = spark.table(to), spark.table(tl)
    # hint("merge"): at driver SFs the orders side fits the broadcast
    # threshold and Catalyst would (correctly) broadcast — but the op
    # exists to certify the bucketed SMJ plan, which is the one that
    # survives when BOTH sides are 100 TB and neither broadcasts; the
    # hint pins that plan shape at every SF so the exchange-free
    # property is what the test and the driver always grade
    return (o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("n_items"),
                 _sum_money(_money_u("l_quantity"), 2)
                 .alias("sum_qty"))
            .orderBy("o_orderpriority"))


_P15_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
            AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "p15_bucketed_colocated_join": p15_bucketed_colocated_join,
    "p14_timezone_convert": p14_timezone_convert,
    "p13_range_arrays": p13_range_arrays,
    "p1_count_star": p1_count_star,
    "p2_nulls": p2_nulls,
    "p3_decimals": p3_decimals,
    "p4_filter_pushdown": p4_filter_pushdown,
    "p5_arrays": p5_arrays,
    "p6_interval": p6_interval,
    "p7_timestamp_parts": p7_timestamp_parts,
    "p8_json": p8_json,
    "p9_uuid": p9_uuid,
    "p10_verify_checksum": p10_verify_checksum,
    "p11_struct_fields": p11_struct_fields,
    "p12_binary_ops": p12_binary_ops,
}

ORACLE = {
    "p15_bucketed_colocated_join": _P15_SQL,
    "p14_timezone_convert": _P14_SQL,
    "p13_range_arrays": _P13_SQL,
    "p1_count_star": _P1_SQL,
    "p2_nulls": _P2_SQL,
    "p3_decimals": _P3_SQL,
    "p4_filter_pushdown": _P4_SQL,
    "p5_arrays": _P5_SQL,
    "p6_interval": _P6_SQL,
    "p7_timestamp_parts": _P7_SQL,
    "p8_json": _P8_SQL,
    "p9_uuid": _P9_SQL,
    "p10_verify_checksum": _P10_SQL,
    "p11_struct_fields": _P11_SQL,
    "p12_binary_ops": _P12_SQL,
}
