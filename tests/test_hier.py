"""Property tests for the shared hierarchical-window helpers
(postgres_scanner_spark/hier.py) — nine operators route their ranks,
running sums, and top-k through these, so the equivalence to the
plain (hot-partition) window is pinned here once instead of
re-derived per operator.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _df(spark, n=500, seed=7):
    """Deterministic skewed frame: few partition keys (one hot), a
    band column contiguous in the sort order, ties in the sort
    value, and NULL scores."""
    import random
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        part = "hot" if rnd.random() < 0.7 else rnd.choice(["a", "b"])
        score = None if rnd.random() < 0.05 else \
            round(rnd.random(), 2)          # coarse → plenty of ties
        val = rnd.randint(1, 9)
        rows.append((i, part, score, val))
    df = spark.createDataFrame(
        rows, "id LONG, part STRING, score DOUBLE, val LONG")
    return df.withColumn(
        "band", F.coalesce(F.floor(F.col("score") * 8).cast("int"),
                           F.lit(2147483647)))


def test_hier_rank_equals_plain_window(spark):
    from postgres_scanner_spark.hier import hier_rank
    df = _df(spark)
    order = [F.asc_nulls_last("score"), F.col("id")]
    got = {r.id: (r.rk, r.n_part) for r in
           hier_rank(df, ["part"], order, "band",
                     total_col="n_part").collect()}
    w = Window.partitionBy("part").orderBy(*order)
    wa = Window.partitionBy("part")
    want = {r.id: (r.rk, r.n_part) for r in
            df.withColumn("rk", F.row_number().over(w))
              .withColumn("n_part", F.count("*").over(wa)).collect()}
    assert got == want


def test_hier_rank_desc_bands_and_global(spark):
    from postgres_scanner_spark.hier import hier_rank
    df = _df(spark).withColumn(
        "band", F.coalesce(F.floor(F.col("score") * 8).cast("int"),
                           F.lit(-1)))          # NULLs last under DESC
    order = [F.desc_nulls_last("score"), F.col("id")]
    got = {r.id: r.rk for r in
           hier_rank(df, [], order, "band", band_desc=True).collect()}
    w = Window.orderBy(*order)
    want = {r.id: r.rk for r in
            df.withColumn("rk", F.row_number().over(w)).collect()}
    assert got == want


@pytest.mark.parametrize("inclusive", [True, False])
def test_hier_cumsum_equals_plain_window(spark, inclusive):
    from postgres_scanner_spark.hier import hier_cumsum
    df = _df(spark).withColumn(
        "band", F.pmod(F.hash("id"), F.lit(16)))  # hash order bands
    # hash-prefix bands must order by a key they are a prefix of:
    # use (band, id) as the sort — contiguity by construction
    order = [F.col("band"), F.col("id")]
    end = Window.currentRow if inclusive else -1
    got = {r.id: r.cum for r in
           hier_cumsum(df, ["part"], order, "band", "val",
                       inclusive=inclusive).collect()}
    w = (Window.partitionBy("part").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, end))
    want = {r.id: r.cum for r in
            df.withColumn("cum", F.coalesce(F.sum("val").over(w),
                                            F.lit(0))).collect()}
    assert got == want


def test_salted_topk_equals_plain_topk(spark):
    from postgres_scanner_spark.hier import salted_topk
    df = _df(spark)
    order = [F.desc_nulls_last("score"), F.col("id")]
    got = sorted((r.part, r.rk, r.id) for r in
                 salted_topk(df, ["part"], order, 5, "id").collect())
    w = Window.partitionBy("part").orderBy(*order)
    want = sorted((r.part, r.rk, r.id) for r in
                  df.withColumn("rk", F.row_number().over(w))
                    .filter(F.col("rk") <= 5).collect())
    assert got == want
