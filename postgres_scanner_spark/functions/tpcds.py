"""TPC-DS-style analytics queries, adapted to the testdata schema.

The reference proves TPC-DS support by running OFFICIAL queries 1-13
through the scanner (reference: test/sql/scanner/tpcds.test, loops at
:23 and :32). The testdata has no TPC-DS tables, so this module
re-expresses the *query shapes* all thirteen exercise — every one of
Q1-Q13 has an adapted counterpart (SURVEY.md §2 has the DSn→official
mapping): above-segment-average filters (Q1), calendar pivots (Q2),
brand/year aggregation (Q3), cross-channel year-over-year ratios
(Q4/Q11), union-of-channels rollup (Q5), correlated-average cohorts
(Q6), multi-measure demographic averages (Q7), substring-list ∩
cohort revenue (Q8), CASE bucket counting (Q9), multi-EXISTS cohorts
(Q10), windowed category shares (Q12), and disjunctive compound
predicates (Q13) — plus share-of-total windows, top-n-per-group, and
set-operation cohorts past the reference's own set, over the
TPC-H-ish tables, each with a bit-exact DuckDB oracle.

Determinism follows functions/tpch.py's contract: money sums in
DECIMAL cast to DOUBLE at the end, BIGINT counts, total-order
tiebreaks on every ORDER BY.

Scale notes: same as tpch.py — only nation/region broadcast hints,
single-shuffle aggregations, window functions partitioned on
low-cardinality keys sized to stay in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..runtime import det_round, money_u as _money_u, sum_money as _sum_money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .. import tables
    return tables.load(spark, sf_dir, name)


# r12: money arithmetic runs on exact fixed-point longs per row (see
# runtime.money_u — the cast(double→decimal)+Decimal.multiply path
# allocated a JavaBigDecimal per row). Aggregates that feed further
# decimal semantics (decimal divisions, comparisons, window sums) are
# cast BACK to the decimal type the legacy sum produced, so every
# downstream expression keeps its exact pre-r12 type and rounding.

def _rev(l) -> F.Column:
    """l_extendedprice*(1-l_discount) in exact 1e-4 units (long)."""
    return (_money_u("l_extendedprice")
            * (F.lit(100) - _money_u("l_discount"))).alias("rev_dec")


def _sum_u_dec(col, digits: int, dectype: str) -> F.Column:
    """Exact sum of fixed-point longs, rescaled and cast back to the
    decimal type the legacy decimal-sum produced (value-exact: the
    quotient has ≤`digits` decimals and the target scale covers it).
    digits <= 6 is a hard limit: Spark caps the quotient scale of
    decimal(38,0)/lit at 6 (r12 ADVICE)."""
    assert digits <= 6, f"_sum_u_dec rescale is exact only to 6 digits, got {digits}"
    return ((F.sum(col.cast("decimal(38,0)")) / F.lit(10 ** digits))
            .cast(dectype))


# ---- DS1 (TPC-DS Q1 shape): customers above 1.2x their nation's
#      average order volume
def ds1_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(_sum_u_dec(_money_u("o_totalprice"), 2, "decimal(22,2)")
             .alias("total_dec"))
    )
    # nation-grain averages as a groupBy + broadcast join, NOT an
    # aggregate window over customer-grain rows: a window partitioned
    # on ~25 nations would sort-and-scan customers/25 rows per task
    # at scale; the join side is |nations| rows
    nation_avg = (per_cust.groupBy("c_nationkey")
                  .agg((F.sum("total_dec") / F.count("*"))
                       .alias("nation_avg")))
    flagged = per_cust.join(F.broadcast(nation_avg), "c_nationkey")
    return (
        flagged.filter(F.col("total_dec") > F.lit(1.2) * F.col("nation_avg"))
        .join(broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", "c_name",
                F.col("n_name").alias("nation"),
                F.col("total_dec").cast("double").alias("total_spent"))
        .orderBy("c_custkey")
    )


_DS1_SQL = """
WITH per_cust AS (
  SELECT c_custkey, c_name, c_nationkey,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_dec
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name, c_nationkey),
flagged AS (
  SELECT *, SUM(total_dec) OVER (PARTITION BY c_nationkey)
            / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
  FROM per_cust)
SELECT c_custkey, c_name, n_name AS nation,
       CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS total_spent
FROM flagged JOIN nation ON c_nationkey = n_nationkey
WHERE total_dec > 1.2 * nation_avg
ORDER BY c_custkey
"""


# ---- DS2 (Q2 shape): revenue share per ISO weekday within each year
def ds2_weekday_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    # r13: u4 carry-through (w9 pattern) — the window sums the exact
    # decimal(38,0) count of 1e-4 units instead of decimal(36,4)
    # group values; both rescale paths cast back through the exact
    # legacy decimal types (decimal(36,4) per group, decimal(38,4)
    # for the window total), so every double is bit-identical.
    per = (
        l.select(F.year("l_shipdate").cast("int").alias("yr"),
                 (F.weekday("l_shipdate") + 1).cast("int").alias("dow"),
                 _rev(l))
        .groupBy("yr", "dow")
        .agg(F.sum(F.col("rev_dec").cast("decimal(38,0)"))
             .alias("rev_u4"))
    )
    w = Window.partitionBy("yr")
    rev_dec = (F.col("rev_u4") / F.lit(10 ** 4)).cast("decimal(36,4)")
    win_dec = ((F.sum("rev_u4").over(w) / F.lit(10 ** 4))
               .cast("decimal(38,4)"))
    return (
        per.select(
            "yr", "dow",
            rev_dec.cast("double").alias("revenue"),
            (rev_dec.cast("double")
             / win_dec.cast("double")).alias("share"))
        .orderBy("yr", "dow")
    )


_DS2_SQL = """
WITH per AS (
  SELECT CAST(year(l_shipdate) AS INT) AS yr,
         CAST(isodow(l_shipdate) AS INT) AS dow,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS rev_dec
  FROM lineitem GROUP BY yr, dow)
SELECT yr, dow, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY yr) AS VARCHAR) AS DOUBLE) AS share
FROM per ORDER BY yr, dow
"""


# ---- DS3 (Q3 shape): revenue by ship year and brand for one p_type
def ds3_brand_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .select(F.year("l_shipdate").cast("int").alias("yr"),
                F.col("p_brand"), _rev(l))
        .groupBy("yr", "p_brand")
        .agg(_sum_money(F.col("rev_dec"), 4).alias("revenue"))
        .orderBy("yr", F.desc("revenue"), "p_brand")
    )


_DS3_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS yr, p_brand,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type = 'PROMO'
GROUP BY yr, p_brand
ORDER BY yr, revenue DESC, p_brand
"""


# ---- DS4 (Q9 shape): CASE bucket counts over order totalprice bands
def ds4_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    def band(lo, hi):
        return F.sum(
            F.when((F.col("o_totalprice") >= lo)
                   & (F.col("o_totalprice") < hi), 1).otherwise(0)
        ).cast("long")
    return o.agg(
        band(0, 50000).alias("band_0_50k"),
        band(50000, 100000).alias("band_50_100k"),
        band(100000, 200000).alias("band_100_200k"),
        band(200000, 10**9).alias("band_200k_up"),
        F.count("*").alias("n_orders"),
    )


_DS4_SQL = """
SELECT
  CAST(SUM(CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000
           THEN 1 ELSE 0 END) AS BIGINT) AS band_0_50k,
  CAST(SUM(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 100000
           THEN 1 ELSE 0 END) AS BIGINT) AS band_50_100k,
  CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000
           THEN 1 ELSE 0 END) AS BIGINT) AS band_100_200k,
  CAST(SUM(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 1000000000
           THEN 1 ELSE 0 END) AS BIGINT) AS band_200k_up,
  COUNT(*) AS n_orders
FROM orders
"""


# ---- DS5: share-of-total window (ratio_to_report idiom): each
#      nation's revenue share within its region
def ds5_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", _rev(l))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("rev_dec").cast("decimal(38,0)"))
             .alias("rev_u4"))
    )
    # r13: u4 carry-through, same construction as ds2 (bit-identical
    # doubles via the legacy decimal(36,4)/decimal(38,4) cast-backs)
    w = Window.partitionBy("r_name")
    rev_dec = (F.col("rev_u4") / F.lit(10 ** 4)).cast("decimal(36,4)")
    win_dec = ((F.sum("rev_u4").over(w) / F.lit(10 ** 4))
               .cast("decimal(38,4)"))
    return (
        per.select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            rev_dec.cast("double").alias("revenue"),
            (rev_dec.cast("double")
             / win_dec.cast("double")).alias("region_share"))
        .orderBy("region", F.desc("revenue"), "nation")
    )


_DS5_SQL = """
WITH per AS (
  SELECT r_name, n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS rev_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name AS region, n_name AS nation,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS VARCHAR) AS DOUBLE)
         AS region_share
FROM per ORDER BY region, revenue DESC, nation
"""


# ---- DS6: top-3 customers per region by spend (top-n-per-group)
def ds6_top_customers_per_region(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_custkey", "c_name")
        .agg(_sum_u_dec(_money_u("o_totalprice"), 2, "decimal(22,2)")
             .alias("total_dec"))
    )
    # two-phase top-k (hier.salted_topk): a region is ~customers/5,
    # one task's worth under a plain per-region window at scale
    from ..hier import salted_topk
    return (
        salted_topk(per, ["r_name"],
                    [F.desc("total_dec"), F.col("c_custkey")],
                    3, "c_custkey")
        .withColumn("rnk", F.col("rk").cast("long"))
        .select(F.col("r_name").alias("region"), "rnk", "c_custkey",
                "c_name", F.col("total_dec").cast("double").alias("spent"))
        .orderBy("region", "rnk")
    )


_DS6_SQL = """
WITH per AS (
  SELECT r_name, c_custkey, c_name,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_dec
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, c_custkey, c_name),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY r_name ORDER BY total_dec DESC, c_custkey) AS rnk
  FROM per)
SELECT r_name AS region, rnk, c_custkey, c_name,
       CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS spent
FROM ranked WHERE rnk <= 3 ORDER BY region, rnk
"""


# ---- DS7: year-over-year revenue growth per nation (lag window)
def ds7_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    per = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name"), F.year("l_shipdate").cast("int").alias("yr"),
                _rev(l))
        .groupBy("n_name", "yr")
        .agg(_sum_u_dec(F.col("rev_dec"), 4, "decimal(36,4)")
             .alias("rev_dec"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag(F.col("rev_dec")).over(w)
    return (
        per.select(
            F.col("n_name").alias("nation"), "yr",
            F.col("rev_dec").cast("double").alias("revenue"),
            ((F.col("rev_dec").cast("double") - prev.cast("double"))
             / prev.cast("double")).alias("yoy_growth"))
        .orderBy("nation", "yr")
    )


_DS7_SQL = """
WITH per AS (
  SELECT n_name, CAST(year(l_shipdate) AS INT) AS yr,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS rev_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, yr)
SELECT n_name AS nation, yr, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       (CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
        - CAST(LAG(rev_dec) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE))
       / CAST(LAG(rev_dec) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
         AS yoy_growth
FROM per ORDER BY nation, yr
"""


# ---- DS8 (set-operation cohort): customers active in BOTH 1994 and
#      1995 (INTERSECT shape) minus those active in 1996 (EXCEPT shape)
def ds8_customer_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    def active(year):
        return (o.filter(F.year("o_orderdate") == year)
                .select("o_custkey").distinct())
    cohort = (active(1994).intersect(active(1995))
              .exceptAll(active(1996)))
    return cohort.select(F.col("o_custkey").alias("c_custkey")) \
        .orderBy("c_custkey")


_DS8_SQL = """
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1994
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY c_custkey
"""


# ---- DS9 (Q5 shape): UNION ALL of two "channels" rolled up together.
#      TPC-DS Q5 unions store/catalog/web sales then aggregates the
#      union with a rollup; here the two channels are supply-side
#      revenue (lineitem→supplier nation) and demand-side order volume
#      (orders→customer nation), rolled up over (channel, nation).
def ds9_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    supply = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.lit("supply").alias("channel"),
                F.col("n_name").alias("nation"), _rev(l))
    )
    demand = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.lit("demand").alias("channel"),
                F.col("n_name").alias("nation"),
                (_money_u("o_totalprice") * 100).alias("rev_dec"))
    )
    return (
        supply.unionByName(demand)
        .rollup("channel", "nation")
        .agg(_sum_money(F.col("rev_dec"), 4).alias("amount"),
             F.count("*").alias("n_rows"))
        .select(F.coalesce("channel", F.lit("ALL")).alias("channel"),
                F.coalesce("nation", F.lit("ALL")).alias("nation"),
                "amount", "n_rows")
        .orderBy("channel", "nation")
    )


_DS9_SQL = """
WITH u AS (
  SELECT 'supply' AS channel, n_name AS nation,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)))
           AS rev_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  UNION ALL
  SELECT 'demand' AS channel, n_name AS nation,
         CAST(o_totalprice AS DECIMAL(12,2)) AS rev_dec
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT COALESCE(channel, 'ALL') AS channel,
       COALESCE(nation, 'ALL') AS nation,
       CAST(CAST(SUM(rev_dec) AS VARCHAR) AS DOUBLE) AS amount,
       COUNT(*) AS n_rows
FROM u GROUP BY ROLLUP(channel, nation)
ORDER BY channel, nation
"""


# ---- DS10 (Q7 shape): multi-measure averages per group under a
#      dimension filter — TPC-DS Q7 averages quantity/list price/
#      discount/sales price by item for one demographic slice.
def ds10_avg_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("p_brand")
        .agg((_sum_money(_money_u("l_quantity"), 2)
              / F.count("*")).alias("avg_qty"),
             (_sum_money(_money_u("l_extendedprice"), 2)
              / F.count("*")).alias("avg_price"),
             (_sum_money(_money_u("l_discount"), 2)
              / F.count("*")).alias("avg_disc"),
             F.count("*").alias("n_lines"))
        .orderBy("p_brand")
    )


_DS10_SQL = """
SELECT p_brand,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS avg_disc,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag IN ('A', 'R')
GROUP BY p_brand
ORDER BY p_brand
"""


# ---- DS11 (TPC-DS Q88 shape): multi-timeband counts in ONE scan
def ds11_timeband_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 runs 8 independent time-slot counts and cross-joins
    the scalars; the efficient plan is ONE scan with conditional
    aggregation — 8 sum(CASE) measures share a single pass and a
    single partial-agg shuffle instead of 8 table scans. That rewrite
    is exactly what matters at 100 TB: scan cost dominates, so
    measures multiplex onto one scan."""
    l = _t(spark, sf_dir, "lineitem")
    q = F.quarter("l_shipdate")
    yr = F.year("l_shipdate")

    def band(y: int, qq: int, name: str) -> F.Column:
        return (F.sum(F.when((yr == y) & (q == qq), 1).otherwise(0))
                .cast("long").alias(name))

    return l.select(
        band(1995, 1, "y95q1"), band(1995, 2, "y95q2"),
        band(1995, 3, "y95q3"), band(1995, 4, "y95q4"),
        band(1996, 1, "y96q1"), band(1996, 2, "y96q2"),
        band(1996, 3, "y96q3"), band(1996, 4, "y96q4"),
    )


_DS11_SQL = """
SELECT
  CAST(SUM(CASE WHEN year(l_shipdate)=1995 AND quarter(l_shipdate)=1
       THEN 1 ELSE 0 END) AS BIGINT) AS y95q1,
  CAST(SUM(CASE WHEN year(l_shipdate)=1995 AND quarter(l_shipdate)=2
       THEN 1 ELSE 0 END) AS BIGINT) AS y95q2,
  CAST(SUM(CASE WHEN year(l_shipdate)=1995 AND quarter(l_shipdate)=3
       THEN 1 ELSE 0 END) AS BIGINT) AS y95q3,
  CAST(SUM(CASE WHEN year(l_shipdate)=1995 AND quarter(l_shipdate)=4
       THEN 1 ELSE 0 END) AS BIGINT) AS y95q4,
  CAST(SUM(CASE WHEN year(l_shipdate)=1996 AND quarter(l_shipdate)=1
       THEN 1 ELSE 0 END) AS BIGINT) AS y96q1,
  CAST(SUM(CASE WHEN year(l_shipdate)=1996 AND quarter(l_shipdate)=2
       THEN 1 ELSE 0 END) AS BIGINT) AS y96q2,
  CAST(SUM(CASE WHEN year(l_shipdate)=1996 AND quarter(l_shipdate)=3
       THEN 1 ELSE 0 END) AS BIGINT) AS y96q3,
  CAST(SUM(CASE WHEN year(l_shipdate)=1996 AND quarter(l_shipdate)=4
       THEN 1 ELSE 0 END) AS BIGINT) AS y96q4
FROM lineitem
"""


# ---- DS12 (TPC-DS Q34/Q73 shape): order-size frequency band ----------
def ds12_order_size_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose orders fall in a line-count band (Q34's
    '15-20 items per ticket' cohort): count lines per order (one
    partial-agg shuffle on the already-clustered orderkey), band-
    filter, then join customers. The band filter runs BEFORE the
    customer join so only qualifying orders shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_order = (
        l.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
        .filter((F.col("n_lines") >= 5) & (F.col("n_lines") <= 7))
    )
    return (
        per_order
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", F.col("o_orderkey").alias("orderkey"),
                "n_lines")
        .orderBy("c_custkey", "orderkey")
    )


_DS12_SQL = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 5 AND 7)
SELECT c_custkey, c_name, o_orderkey AS orderkey, n_lines
FROM per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY c_custkey, orderkey
"""


# ---- DS13 (TPC-DS Q65 shape): below-average revenue items per group
def ds13_low_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q65's correlated-average shape: per supplier, surface parts
    whose revenue runs below 50% of that supplier's average part
    revenue. Two aggregations share one (suppkey, partkey) shuffle;
    the supplier average joins back as a per-supplier scalar (tiny
    side, AQE broadcast)."""
    l = _t(spark, sf_dir, "lineitem")
    # sum the UNROUNDED scale-4 products: pre-rounding each row to 2
    # decimals hits half-cent ties, where Spark rounds HALF_UP and
    # DuckDB HALF_EVEN — the exact sum sidesteps the mode difference
    per_part = (
        l.groupBy("l_suppkey", "l_partkey")
        .agg(_sum_u_dec(_rev(l), 4, "decimal(36,4)").alias("rev_dec")))
    # the per-supplier average divides in DOUBLE on both engines —
    # decimal-division scale rules differ between Spark and DuckDB
    per_supp = (per_part.groupBy("l_suppkey")
                .agg((F.sum("rev_dec").cast("double") / F.count("*"))
                     .alias("avg_rev")))
    return (
        per_part.join(per_supp, "l_suppkey")
        .filter(F.col("rev_dec") < F.col("avg_rev") * 0.5)
        .select("l_suppkey", "l_partkey",
                F.col("rev_dec").cast("double").alias("revenue"),
                det_round(F.col("avg_rev"), 2).alias("supp_avg"))
        .orderBy("l_suppkey", "l_partkey")
    )


_DS13_SQL = """
WITH per_part AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2))
                - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
  FROM lineitem GROUP BY l_suppkey, l_partkey),
per_supp AS (
  SELECT l_suppkey, CAST(CAST(SUM(rev_dec) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_rev
  FROM per_part GROUP BY l_suppkey)
SELECT l_suppkey, l_partkey, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       FLOOR((avg_rev) * 100.0 + 0.5) / 100.0 AS supp_avg
FROM per_part JOIN per_supp USING (l_suppkey)
WHERE rev_dec < avg_rev * 0.5
ORDER BY l_suppkey, l_partkey
"""


# ---- DS14 (TPC-DS Q62/Q99 shape): shipping-lag buckets ---------------
def ds14_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q62/Q99's lag-bucket shape: days from order to ship, banded
    (<=30 / <=60 / <=90 / >90), counted per order priority in ONE
    conditional-aggregation pass over the join."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))

    def band(lo, hi, name):
        if lo is None:
            cond = lag <= hi
        elif hi is None:
            cond = lag > lo
        else:
            cond = (lag > lo) & (lag <= hi)
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(band(None, 30, "d30"), band(30, 60, "d60"),
             band(60, 90, "d90"), band(90, None, "d90plus"))
        .orderBy("o_orderpriority")
    )


_DS14_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT)
    AS d30,
  CAST(SUM(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) > 30
       AND datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) <= 60 THEN 1 ELSE 0 END) AS BIGINT)
    AS d60,
  CAST(SUM(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) > 60
       AND datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS BIGINT)
    AS d90,
  CAST(SUM(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
       CAST(l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS BIGINT)
    AS d90plus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---- DS15 (TPC-DS Q4 shape): cross-channel year-over-year ratio ------
def ds15_channel_growth_ratio(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Q4's defining shape: per-customer yearly totals in TWO
    channels across two consecutive years, keeping customers whose
    growth ratio in channel A exceeds channel B. Channels adapt to
    order priority (urgent/high = 'priority', rest = 'standard' —
    the testdata has no store/catalog/web split; DS9's pseudo-channel
    device). Guards mirror the official query: both year-1 totals
    must be positive. The official CTE self-join collapses to ONE
    conditional aggregation (4 decimal sums, one shuffle) — the
    Spark-honest plan for a 2×2 year/channel matrix; exact decimal
    totals, ratios compared (and emitted) in double."""
    o = _t(spark, sf_dir, "orders")
    pri = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    yr = F.year("o_orderdate")

    def tot(is_pri, year, name):
        cond = (pri if is_pri else ~pri) & (yr == year)
        return _sum_u_dec(F.when(cond, _money_u("o_totalprice"))
                          .otherwise(F.lit(0)), 2,
                          "decimal(22,2)").alias(name)

    # sargable range instead of year() IN (...): the predicate must
    # reach the parquet scan (PushedFilters) / remote WHERE
    per = (o.filter((F.col("o_orderdate") >= "1994-01-01")
                    & (F.col("o_orderdate") < "1996-01-01"))
           .groupBy(F.col("o_custkey").alias("custkey"))
           .agg(tot(True, 1994, "p94"), tot(True, 1995, "p95"),
                tot(False, 1994, "s94"), tot(False, 1995, "s95")))
    pr = F.col("p95").cast("double") / F.col("p94").cast("double")
    sr = F.col("s95").cast("double") / F.col("s94").cast("double")
    return (per.filter((F.col("p94") > 0) & (F.col("s94") > 0))
            .withColumn("priority_ratio", det_round(pr, 6))
            .withColumn("standard_ratio", det_round(sr, 6))
            .filter(F.col("priority_ratio") > F.col("standard_ratio"))
            .select("custkey", "priority_ratio", "standard_ratio")
            .orderBy("custkey"))


_DS15_SQL = """
WITH per AS (
  SELECT o_custkey AS custkey,
    SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             AND year(CAST(o_orderdate AS DATE)) = 1994
             THEN CAST(o_totalprice AS DECIMAL(12,2))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS p94,
    SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             AND year(CAST(o_orderdate AS DATE)) = 1995
             THEN CAST(o_totalprice AS DECIMAL(12,2))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS p95,
    SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             AND year(CAST(o_orderdate AS DATE)) = 1994
             THEN CAST(o_totalprice AS DECIMAL(12,2))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS s94,
    SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             AND year(CAST(o_orderdate AS DATE)) = 1995
             THEN CAST(o_totalprice AS DECIMAL(12,2))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS s95
  FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) IN (1994, 1995)
  GROUP BY o_custkey)
SELECT custkey,
       FLOOR((CAST(CAST(p95 AS VARCHAR) AS DOUBLE) / CAST(CAST(p94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS priority_ratio,
       FLOOR((CAST(CAST(s95 AS VARCHAR) AS DOUBLE) / CAST(CAST(s94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS standard_ratio
FROM per
WHERE p94 > 0 AND s94 > 0
  AND FLOOR((CAST(CAST(p95 AS VARCHAR) AS DOUBLE) / CAST(CAST(p94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
      > FLOOR((CAST(CAST(s95 AS VARCHAR) AS DOUBLE) / CAST(CAST(s94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
ORDER BY custkey
"""


# ---- DS16 (TPC-DS Q6 shape): above-global-average cohort per nation --
def ds16_above_avg_balance_nations(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Q6's defining shape: a scalar correlated average (global avg
    account balance × 1.2) filters the fact side, grouped by
    geography with a HAVING floor. The 1-row global average
    broadcasts (the whitelisted scalar pattern); active = customer
    placed ≥1 order in 1994 (Q6's month-cohort device on the
    testdata calendar)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    gavg = c.agg((_sum_money(_money_u("c_acctbal"), 2)
                  / F.count("*")).alias("global_avg"))
    active = (o.filter((F.col("o_orderdate") >= "1994-01-01")
                       & (F.col("o_orderdate") < "1995-01-01"))
              .select("o_custkey").distinct())
    return (c.join(active, c.c_custkey == active.o_custkey)
            .crossJoin(broadcast(gavg))
            .filter(F.col("c_acctbal").cast("double")
                    > F.lit(1.2) * F.col("global_avg"))
            .join(broadcast(n), F.col("c_nationkey") == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count("*").cast("long").alias("n_customers"))
            .filter(F.col("n_customers") >= 10)
            .orderBy("nation"))


_DS16_SQL = """
WITH gavg AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS global_avg
  FROM customer),
active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = 1994)
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN active ON c_custkey = o_custkey
CROSS JOIN gavg
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DOUBLE) > 1.2 * global_avg
GROUP BY n_name HAVING COUNT(*) >= 10
ORDER BY nation
"""


# ---- DS17 (TPC-DS Q8 shape): substring-list semi-join ∩ cohort -------
def ds17_substr_cohort_revenue(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Q8's defining shape: revenue restricted to customers whose
    identifier SUBSTRING matches a literal list (zip prefixes in the
    official query; the customer number's last-2 digits here),
    INTERSECTed with a second cohort (above-average balance — the
    official 'preferred customers' arm). Both cohorts are customer-
    key sets; the intersect is a semi-join chain, then one revenue
    aggregate per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    suffix = F.substring(F.col("c_name"), -2, 2)
    in_list = c.filter(suffix.isin("11", "24", "37", "42", "59", "73",
                                   "86", "98")).select("c_custkey")
    gavg = c.agg((_sum_money(_money_u("c_acctbal"), 2)
                  / F.count("*")).alias("ga"))
    preferred = (c.crossJoin(broadcast(gavg))
                 .filter(F.col("c_acctbal").cast("double") > F.col("ga"))
                 .select("c_custkey"))
    cohort = (in_list.intersect(preferred)
              .select(F.col("c_custkey").alias("k_custkey")))
    return (o.join(cohort, o.o_custkey == F.col("k_custkey"))
            .join(c, o.o_custkey == c.c_custkey)
            .join(broadcast(n), F.col("c_nationkey") == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count("*").cast("long").alias("n_orders"),
                 _sum_money(_money_u("o_totalprice"), 2)
                 .alias("revenue"))
            .orderBy("nation"))


_DS17_SQL = """
WITH gavg AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS ga FROM customer),
in_list AS (
  SELECT c_custkey FROM customer
  WHERE substr(c_name, -2, 2) IN
        ('11','24','37','42','59','73','86','98')),
preferred AS (
  SELECT c_custkey FROM customer CROSS JOIN gavg
  WHERE CAST(c_acctbal AS DOUBLE) > ga),
cohort AS (SELECT * FROM in_list INTERSECT SELECT * FROM preferred)
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         AS revenue
FROM orders
JOIN cohort ON o_custkey = c_custkey
JOIN customer ON o_custkey = customer.c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY nation
"""


# ---- DS18 (TPC-DS Q10 shape): EXISTS AND (EXISTS OR EXISTS) ----------
def ds18_multi_exists_cohort(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Q10's defining shape: customers that appear in one channel
    AND at least one of two others — EXISTS q1 AND (EXISTS q2 OR
    EXISTS q3) — counted per demographic. Channels adapt to 1994
    quarters; the demographic is the market segment. Each EXISTS is
    a distinct-key semi-join (no row multiplication), composed with
    a left-semi ∘ (union of semis) chain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o94 = o.filter((F.col("o_orderdate") >= "1994-01-01")
                   & (F.col("o_orderdate") < "1995-01-01")).select(
        "o_custkey", F.quarter("o_orderdate").alias("q"))
    q1 = o94.filter(F.col("q") == 1).select("o_custkey").distinct()
    q23 = (o94.filter(F.col("q").isin(2, 3))
           .select("o_custkey").distinct())
    return (c.join(q1, c.c_custkey == q1.o_custkey, "left_semi")
            .join(q23, c.c_custkey == q23.o_custkey, "left_semi")
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").cast("long").alias("n_customers"))
            .orderBy("segment"))


_DS18_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND year(CAST(o_orderdate AS DATE)) = 1994
                AND quarter(CAST(o_orderdate AS DATE)) = 1)
  AND (EXISTS (SELECT 1 FROM orders
               WHERE o_custkey = c_custkey
                 AND year(CAST(o_orderdate AS DATE)) = 1994
                 AND quarter(CAST(o_orderdate AS DATE)) = 2)
    OR EXISTS (SELECT 1 FROM orders
               WHERE o_custkey = c_custkey
                 AND year(CAST(o_orderdate AS DATE)) = 1994
                 AND quarter(CAST(o_orderdate AS DATE)) = 3))
GROUP BY c_mktsegment ORDER BY segment
"""


# ---- DS19 (TPC-DS Q11 shape): two-fact year-over-year comparison -----
def ds19_two_fact_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's defining shape (Q4's sibling): per-customer yearly
    totals from TWO DIFFERENT FACT TABLES (store vs web there;
    order headers vs lineitem revenue here), keeping customers whose
    fact-B growth outpaces fact-A growth between two years. Both
    sides aggregate before the customer-key join — the fact tables
    never join each other row-to-row."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    yr_o = F.year("o_orderdate")
    head = (o.filter((F.col("o_orderdate") >= "1994-01-01")
                     & (F.col("o_orderdate") < "1996-01-01"))
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(_sum_u_dec(F.when(yr_o == 1994,
                                   _money_u("o_totalprice"))
                            .otherwise(F.lit(0)), 2,
                            "decimal(22,2)").alias("h94"),
                 _sum_u_dec(F.when(yr_o == 1995,
                                   _money_u("o_totalprice"))
                            .otherwise(F.lit(0)), 2,
                            "decimal(22,2)").alias("h95")))
    yr_l = F.year("l_shipdate")
    rev = (l.join(o.select("o_orderkey", "o_custkey"),
                  l.l_orderkey == F.col("o_orderkey"))
           .filter((F.col("l_shipdate") >= "1994-01-01")
                   & (F.col("l_shipdate") < "1996-01-01"))
           .groupBy(F.col("o_custkey").alias("custkey"))
           .agg(_sum_u_dec(F.when(yr_l == 1994, _rev(l))
                           .otherwise(F.lit(0)), 4,
                           "decimal(36,4)").alias("r94"),
                _sum_u_dec(F.when(yr_l == 1995, _rev(l))
                           .otherwise(F.lit(0)), 4,
                           "decimal(36,4)").alias("r95")))
    hr = F.col("h95").cast("double") / F.col("h94").cast("double")
    rr = F.col("r95").cast("double") / F.col("r94").cast("double")
    return (head.join(rev, "custkey")
            .filter((F.col("h94") > 0) & (F.col("r94") > 0))
            .withColumn("rev_ratio", det_round(rr, 6))
            .withColumn("head_ratio", det_round(hr, 6))
            .filter(F.col("rev_ratio") > F.col("head_ratio"))
            .select("custkey", "rev_ratio", "head_ratio")
            .orderBy("custkey"))


_DS19_SQL = """
WITH head AS (
  SELECT o_custkey AS custkey,
    SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1994
        THEN CAST(o_totalprice AS DECIMAL(12,2))
        ELSE CAST(0 AS DECIMAL(12,2)) END) AS h94,
    SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
        THEN CAST(o_totalprice AS DECIMAL(12,2))
        ELSE CAST(0 AS DECIMAL(12,2)) END) AS h95
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1994, 1995)
  GROUP BY o_custkey),
rev AS (
  SELECT o_custkey AS custkey,
    SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1994
        THEN CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2))
                - CAST(l_discount AS DECIMAL(4,2)))
        ELSE CAST(0 AS DECIMAL(14,4)) END) AS r94,
    SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1995
        THEN CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2))
                - CAST(l_discount AS DECIMAL(4,2)))
        ELSE CAST(0 AS DECIMAL(14,4)) END) AS r95
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(CAST(l_shipdate AS DATE)) IN (1994, 1995)
  GROUP BY o_custkey)
SELECT custkey,
       FLOOR((CAST(CAST(r95 AS VARCHAR) AS DOUBLE) / CAST(CAST(r94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS rev_ratio,
       FLOOR((CAST(CAST(h95 AS VARCHAR) AS DOUBLE) / CAST(CAST(h94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS head_ratio
FROM head JOIN rev USING (custkey)
WHERE h94 > 0 AND r94 > 0
  AND FLOOR((CAST(CAST(r95 AS VARCHAR) AS DOUBLE) / CAST(CAST(r94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
      > FLOOR((CAST(CAST(h95 AS VARCHAR) AS DOUBLE) / CAST(CAST(h94 AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
ORDER BY custkey
"""


# ---- DS20 (TPC-DS Q12 shape): share-of-category over a date window ---
def ds20_category_share_window(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Q12's defining shape: revenue per item within its category
    over a bounded date window, each row carrying its share of the
    category total (ratio_to_report). Category = p_brand, item =
    p_type; the share window partitions on brand (bounded
    cardinality). Exact decimal sums; ONE final double division per
    row."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    win = (l.filter((F.col("l_shipdate") >= "1994-01-01")
                    & (F.col("l_shipdate") < "1994-01-31"))
           .join(p, l.l_partkey == p.p_partkey)
           .groupBy("p_brand", "p_type")
           .agg(F.sum(_rev(l).cast("decimal(38,0)")).alias("rev_u4")))
    # r13: u4 carry-through, same construction as ds2/ds5
    w = Window.partitionBy("p_brand")
    rev_dec = (F.col("rev_u4") / F.lit(10 ** 4)).cast("decimal(36,4)")
    win_dec = ((F.sum("rev_u4").over(w) / F.lit(10 ** 4))
               .cast("decimal(38,4)"))
    return (win.withColumn(
        "brand_share",
        det_round(rev_dec.cast("double")
                  / win_dec.cast("double"), 6))
        .select("p_brand", "p_type",
                rev_dec.cast("double").alias("revenue"),
                "brand_share")
        .orderBy("p_brand", "p_type"))


_DS20_SQL = """
WITH win AS (
  SELECT p_brand, p_type,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2))
                - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1994-01-31'
  GROUP BY p_brand, p_type)
SELECT p_brand, p_type, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       FLOOR((CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY p_brand) AS VARCHAR) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS brand_share
FROM win ORDER BY p_brand, p_type
"""


# ---- DS21 (TPC-DS Q13 shape): disjunctive compound predicate ---------
def ds21_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13's defining shape: one fact scan under an OR of AND-ed
    demographic/band triplets, feeding several averages at once.
    Triplets adapt to (order priority, quantity band): the optimizer
    must keep the disjunction as a single scan predicate — no
    union-of-scans rewrite. Averages = exact decimal sums / counts,
    divided once in double."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pred = (
        ((F.col("o_orderpriority") == "1-URGENT")
         & F.col("l_quantity").between(1, 10))
        | ((F.col("o_orderpriority") == "2-HIGH")
           & F.col("l_quantity").between(11, 25))
        | ((F.col("o_orderpriority") == "3-MEDIUM")
           & F.col("l_quantity").between(26, 50)))
    j = l.join(o, l.l_orderkey == o.o_orderkey).filter(pred)
    return (j.groupBy("l_returnflag")
            .agg(F.count("*").cast("long").alias("n"),
                 det_round(_sum_money(_money_u("l_quantity"), 2)
                           / F.count("*"), 6)
                 .alias("avg_qty"),
                 det_round(_sum_money(_money_u("l_extendedprice"), 2)
                           / F.count("*"), 6)
                 .alias("avg_price"),
                 _sum_money(_money_u("o_totalprice"), 2)
                 .alias("sum_order_total"))
            .orderBy("l_returnflag"))


_DS21_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       FLOOR((CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
             / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
       FLOOR((CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
             / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         AS sum_order_total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE (o_orderpriority = '1-URGENT'
       AND l_quantity BETWEEN 1 AND 10)
   OR (o_orderpriority = '2-HIGH'
       AND l_quantity BETWEEN 11 AND 25)
   OR (o_orderpriority = '3-MEDIUM'
       AND l_quantity BETWEEN 26 AND 50)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "ds1_above_avg_customers": ds1_above_avg_customers,
    "ds2_weekday_share": ds2_weekday_share,
    "ds3_brand_year": ds3_brand_year,
    "ds4_price_buckets": ds4_price_buckets,
    "ds5_nation_share": ds5_nation_share,
    "ds6_top_customers_per_region": ds6_top_customers_per_region,
    "ds7_yoy_growth": ds7_yoy_growth,
    "ds8_customer_cohort": ds8_customer_cohort,
    "ds9_channel_rollup": ds9_channel_rollup,
    "ds10_avg_measures": ds10_avg_measures,
    "ds11_timeband_counts": ds11_timeband_counts,
    "ds12_order_size_band": ds12_order_size_band,
    "ds13_low_revenue_parts": ds13_low_revenue_parts,
    "ds14_shipping_lag": ds14_shipping_lag,
    "ds15_channel_growth_ratio": ds15_channel_growth_ratio,
    "ds16_above_avg_balance_nations": ds16_above_avg_balance_nations,
    "ds17_substr_cohort_revenue": ds17_substr_cohort_revenue,
    "ds18_multi_exists_cohort": ds18_multi_exists_cohort,
    "ds19_two_fact_growth": ds19_two_fact_growth,
    "ds20_category_share_window": ds20_category_share_window,
    "ds21_disjunctive_bands": ds21_disjunctive_bands,
}

ORACLE = {
    "ds1_above_avg_customers": _DS1_SQL,
    "ds2_weekday_share": _DS2_SQL,
    "ds3_brand_year": _DS3_SQL,
    "ds4_price_buckets": _DS4_SQL,
    "ds5_nation_share": _DS5_SQL,
    "ds6_top_customers_per_region": _DS6_SQL,
    "ds7_yoy_growth": _DS7_SQL,
    "ds8_customer_cohort": _DS8_SQL,
    "ds9_channel_rollup": _DS9_SQL,
    "ds10_avg_measures": _DS10_SQL,
    "ds11_timeband_counts": _DS11_SQL,
    "ds12_order_size_band": _DS12_SQL,
    "ds13_low_revenue_parts": _DS13_SQL,
    "ds14_shipping_lag": _DS14_SQL,
    "ds15_channel_growth_ratio": _DS15_SQL,
    "ds16_above_avg_balance_nations": _DS16_SQL,
    "ds17_substr_cohort_revenue": _DS17_SQL,
    "ds18_multi_exists_cohort": _DS18_SQL,
    "ds19_two_fact_growth": _DS19_SQL,
    "ds20_category_share_window": _DS20_SQL,
    "ds21_disjunctive_bands": _DS21_SQL,
}
