"""Hierarchical (two-level) window helpers — the repo's standard
answer to hot-partition windows.

A rank or running sum whose window partitions on a LOW-CARDINALITY
key (source ~20, lang ~5, priority 5 — or nothing at all) over
row-grain data serializes the hot partition through one task at
corpus scale. The fix, used across x4/x5/x11/x12/x15/t17/m9: split
each partition into BANDS that are contiguous ranges of the window's
sort order (an md5-prefix for hash orders, a score range for value
orders), run the window on (partition, band) — fully parallel — and
restore the exact partition-wide result by adding broadcast per-band
offsets (exclusive prefix totals over the tiny band table). Identical
output by associativity of + / the totality of the row order.

`salted_topk` is the top-k variant (w3/ds6): rank within
(partition, salt) first, keep each salt's top k — any partition-wide
top-k row is top-k within its salt — then re-rank the bounded
survivors.

Every helper PERSISTS its input via scratch_persist: the frame feeds
both the local window and the band-count aggregate, and unpersisted
it would re-run its (typically tokenize/hash-heavy) lineage twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .runtime import scratch_persist


def _band_offsets(df: DataFrame, part_cols: list[str], band_col: str,
                  val_col: str | None, band_desc: bool) -> DataFrame:
    """Per-(partition, band) exclusive prefix totals + partition
    totals. Band-grain rows: tiny at any corpus size (bands are
    bounded by hash-prefix/score-range cardinality, not by data)."""
    order = F.desc(band_col) if band_desc else F.asc(band_col)
    w_off = (Window.partitionBy(*part_cols).orderBy(order)
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy(*part_cols) if part_cols else \
        Window.partitionBy(F.lit(0))
    agg = (df.groupBy(*part_cols, band_col)
           .agg((F.count("*") if val_col is None else F.sum(val_col))
                .alias("_n")))
    return (agg
            .withColumn("_off", F.coalesce(F.sum("_n").over(w_off),
                                           F.lit(0)))
            .withColumn("_n_part", F.sum("_n").over(w_all))
            .select(*part_cols, band_col, "_off", "_n_part"))


def hier_rank(df: DataFrame, part_cols: list[str], order_cols: list,
              band_col: str, *, band_desc: bool = False,
              out_col: str = "rk",
              total_col: str | None = None) -> DataFrame:
    """df + out_col == ROW_NUMBER() OVER (PARTITION BY part_cols
    ORDER BY order_cols), with band_col a column whose value ranges
    are contiguous in that order. Optionally adds total_col = the
    partition's row count (from the same tiny band table)."""
    df = scratch_persist(df)
    w_local = Window.partitionBy(*part_cols, band_col).orderBy(*order_cols)
    local = df.withColumn("_rl", F.row_number().over(w_local))
    offs = _band_offsets(df, part_cols, band_col, None, band_desc)
    out = (local.join(F.broadcast(offs), [*part_cols, band_col])
           .withColumn(out_col, F.col("_off") + F.col("_rl")))
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_n_part"))
    return out.drop("_rl", "_off", "_n_part")


def hier_cumsum(df: DataFrame, part_cols: list[str], order_cols: list,
                band_col: str, val_col: str, *, inclusive: bool,
                out_col: str = "cum",
                band_desc: bool = False) -> DataFrame:
    """df + out_col == SUM(val_col) OVER (PARTITION BY part_cols
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING [AND 1 PRECEDING])
    — inclusive=False gives the exclusive prefix sum."""
    df = scratch_persist(df)
    end = Window.currentRow if inclusive else -1
    w_local = (Window.partitionBy(*part_cols, band_col)
               .orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, end))
    local = df.withColumn(
        "_cl", F.coalesce(F.sum(val_col).over(w_local), F.lit(0)))
    offs = _band_offsets(df, part_cols, band_col, val_col, band_desc)
    return (local.join(F.broadcast(offs), [*part_cols, band_col])
            .withColumn(out_col, F.col("_off") + F.col("_cl"))
            .drop("_cl", "_off", "_n_part"))


def salted_topk(df: DataFrame, part_cols: list[str], order_cols: list,
                k: int, salt_src: str, *, n_salts: int = 64,
                out_col: str = "rk") -> DataFrame:
    """Top-k per partition as a two-phase rank: phase 1 within
    (partition, salt-of-n_salts) — parallel however hot a partition
    is — keeping each salt's top k; phase 2 over the
    ≤ |partitions|·n_salts·k survivors. order_cols must be a total
    order (unique tiebreak) for identical output."""
    w1 = Window.partitionBy(*part_cols, "_salt").orderBy(*order_cols)
    cand = (df.withColumn("_salt", F.pmod(F.hash(salt_src),
                                          F.lit(n_salts)))
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_salt", "_r1"))
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (cand.withColumn(out_col, F.row_number().over(w))
            .filter(F.col(out_col) <= k))
