#!/usr/bin/env python3
"""Empirical scale probe: replicate the sf0.1 tables R× with key
offsets and measure wall time of representative operators at
R = 1, 4, 16. Near-linear growth (ratio ≈ R between rows) is the
evidence that the plans scale by partitioning, not by luck — the
same argument PLANS.md makes structurally, measured.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def amplify(df: DataFrame, r: int, key: str, stride: int) -> DataFrame:
    """R copies with offset keys — the cheap stand-in for an R×
    larger dataset with the same distribution."""
    out = None
    for i in range(r):
        c = df.withColumn(key, F.col(key) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def q1_shape(li: DataFrame) -> int:
    """TPC-H Q1 shape: scan-heavy single-shuffle aggregate."""
    res = (li.filter(F.col("l_shipdate") <= "1998-09-02")
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
                F.avg("l_discount").alias("ad"),
                F.count("*").alias("n")))
    return len(res.collect())


def d2_core(docs: DataFrame) -> int:
    """MinHash signature + band candidates (the d2 hot path)."""
    from postgres_scanner_spark.operators.dedup import shingle_index
    shx = shingle_index(docs, 3)
    h0 = F.md5(F.concat(F.lit("0:"), F.col("s")))
    h1 = F.md5(F.concat(F.lit("1:"), F.col("s")))
    sig = shx.groupBy("doc_id").agg(
        *[F.min(F.substring([h0, h1][m // 4], 1 + 8 * (m % 4), 8))
          .alias(f"mh{m}") for m in range(8)])
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.md5(F.concat(F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")))
                     .alias("band_hash"))
            for b in range(4)])).alias("bd")
    ).select("doc_id", "bd.band_id", "bd.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
    return cand.count()


def t7_shape(docs: DataFrame) -> int:
    """Explode-heavy repetition stats (word + bigram aggregations)."""
    from postgres_scanner_spark.operators.dedup import shingle_index
    words = docs.select("doc_id",
                        F.explode(F.split(F.lower("text"), " ")).alias("t"))
    wstat = (words.groupBy("doc_id", "t").count()
             .groupBy("doc_id").agg(F.sum("count").alias("n"),
                                    F.max("count").alias("mx")))
    bg = shingle_index(docs, 2)
    bstat = bg.groupBy("doc_id").agg(F.count("*").alias("nb"))
    return wstat.join(bstat, "doc_id").count()


def cc_shape(docs: DataFrame) -> int:
    """Iterative connected components over exact-hash star edges."""
    keys = docs.select("doc_id", F.md5(F.lower("text")).alias("k"))
    hubs = keys.groupBy("k").agg(F.min("doc_id").alias("hub"))
    star = (keys.join(hubs, "k")
            .filter(F.col("doc_id") != F.col("hub"))
            .select(F.col("hub").alias("src"), F.col("doc_id").alias("dst")))
    edges = star.unionByName(
        star.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = docs.select("doc_id", F.col("doc_id").alias("lbl")) \
        .localCheckpoint()
    for _ in range(3):
        prop = (edges.join(labels, edges.src == labels.doc_id)
                .groupBy("dst").agg(F.min("lbl").alias("nlbl")))
        labels = (labels.join(prop, labels.doc_id == prop.dst, "left")
                  .select(labels.doc_id,
                          F.least("lbl", F.coalesce("nlbl", "lbl"))
                          .alias("lbl")).localCheckpoint())
    n = labels.select("lbl").distinct().count()
    edges.unpersist()
    return n


def d8_shape(docs: DataFrame) -> int:
    """Incremental dedup: batch-hash broadcast probe of the corpus
    (the corpus side must stay exchange-free at any R)."""
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    h = F.md5(F.lower(F.col("text"))).alias("h")
    probe = batch.select(h).distinct()
    hits = (corpus.select(h)
            .join(F.broadcast(probe), "h", "left_semi").distinct())
    kept = batch.select("doc_id", h).join(
        F.broadcast(hits), "h", "left_anti")
    return kept.count()


def x6_shape(docs: DataFrame) -> int:
    """Bucket-parallel global shuffle-position assignment."""
    from pyspark.sql.window import Window
    hashed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    ).withColumn("bucket", F.substring("h", 1, 2))
    w_in = Window.partitionBy("bucket").orderBy("h", "doc_id")
    ranked = hashed.withColumn("r", F.row_number().over(w_in))
    sizes = hashed.groupBy("bucket").agg(F.count("*").alias("n"))
    w_pre = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1)
    offsets = sizes.withColumn(
        "off", F.coalesce(F.sum("n").over(w_pre), F.lit(0)))
    out = ranked.join(F.broadcast(offsets.select("bucket", "off")),
                      "bucket").select(
        "doc_id", (F.col("off") + F.col("r")).alias("pos"))
    return out.count()


def d10_shape(docs: DataFrame) -> int:
    """Boilerplate-paragraph removal: para-keyed DF count + filtered
    boilerplate build side (must stay broadcast-sized at any R)."""
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    nch = F.ceil(F.size("t") / F.lit(8)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.concat_ws(" ", F.slice("t", i * 8 + 1, 8)))
    paras = t.select("doc_id", F.posexplode(chunks).alias("p", "para"))
    boiler = (paras.groupBy("para")
              .agg(F.countDistinct("doc_id").alias("dfd"))
              .filter(F.col("dfd") > 3).select("para"))
    flagged = paras.join(boiler.withColumn("b", F.lit(True)),
                         "para", "left")
    return (flagged.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("b").isNull(), 1).otherwise(0))
                 .alias("k")).count())


def t11_shape(docs: DataFrame) -> int:
    """BPE pair counting: explode + pair-keyed agg + top-k."""
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")).filter(
        F.length("w") >= 2)
    idx = F.sequence(F.lit(1), F.length("w") - 1)
    pairs = words.select(F.explode(F.transform(
        idx, lambda i: F.col("w").substr(i, F.lit(2)))).alias("p"))
    return (pairs.groupBy("p").count()
            .orderBy(F.desc("count"), "p").limit(20).count())


def a6_shape(embs: DataFrame) -> int:
    """One Lloyd iteration: broadcast-assign + (cluster,dim) update."""
    from postgres_scanner_spark.operators.ann import _km_assign
    vecs = embs.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"))
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").cast("int").alias("cent_id"),
                     F.col("x").alias("c")))
    a1 = _km_assign(vecs, cents)
    upd = (a1.select("cluster", F.posexplode("x").alias("pos", "val"))
           .groupBy("cluster", "pos")
           .agg(F.sum(F.col("val").cast("decimal(28,9)")).alias("s"),
                F.count("*").alias("n")))
    return upd.count()


def t17_shape(docs: DataFrame) -> int:
    """Reference-LM scoring: per-(doc,word) counts joined to the
    vocabulary on the word key (the Zipf-hot token shuffle)."""
    tok = docs.select("doc_id",
                      F.explode(F.split(F.lower("text"), " ")).alias("w")) \
        .filter(F.col("w") != "")
    per_word = tok.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    refc = (tok.filter(F.col("doc_id") % 20 == 0)
            .groupBy("w").agg(F.count("*").alias("c")))
    scored = per_word.join(refc, "w", "left")
    return (scored.groupBy("doc_id")
            .agg(F.sum(F.col("cnt") * F.log(F.coalesce("c", F.lit(0)) + 1))
                 .alias("s")).count())


def m9_shape(docs: DataFrame) -> int:
    """Hierarchical prefix sum (shard repack): per-bucket parallel
    cumsum + tiny bucket-offset relation — must never plan a
    single-partition window over the data."""
    from pyspark.sql.window import Window
    member = docs.select(
        "doc_id", (F.col("doc_id") / 256).cast("long").alias("bkt"),
        (F.lit(512) + 512 * F.ceil(F.octet_length("text") / 512.0)
         .cast("long")).alias("bytes"))
    w_local = (Window.partitionBy("bkt").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    local = member.withColumn(
        "lp", F.coalesce(F.sum("bytes").over(w_local), F.lit(0)))
    totals = member.groupBy("bkt").agg(F.sum("bytes").alias("bb"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "bkt", F.coalesce(F.sum("bb").over(w_b), F.lit(0)).alias("off"))
    planned = local.join(F.broadcast(offs), "bkt").select(
        ((F.col("off") + F.col("lp")) / 65536).cast("long").alias("sid"))
    return planned.groupBy("sid").count().count()


def d16_shape(docs: DataFrame) -> int:
    """CDC chunking: per-doc rolling-hash boundaries + chunk-hash
    share report (chunk text never crosses docs)."""
    from pyspark.sql.window import Window
    tok = docs.select("doc_id",
                      F.posexplode(F.split(F.lower("text"), " "))
                      .alias("pos", "w")).filter(F.col("w") != "")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    ctx = F.concat_ws("\x01",
                      F.coalesce(F.lag("w", 2).over(wd), F.lit("")),
                      F.coalesce(F.lag("w", 1).over(wd), F.lit("")),
                      F.col("w"))
    h = F.conv(F.substring(F.md5(ctx), 1, 8), 16, 10).cast("bigint")
    flagged = tok.withColumn("b", (h % 16 == 0).cast("int"))
    chunked = flagged.withColumn(
        "cid", F.coalesce(F.sum("b").over(
            wd.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    chunks = (chunked.groupBy("doc_id", "cid")
              .agg(F.md5(F.concat_ws(" ", F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "w"))),
                  lambda x: x["w"]))).alias("ch")))
    return chunks.groupBy("ch").count().count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from postgres_scanner_spark import get_spark
    spark = get_spark(cpus="32")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    # warm JIT/codegen so R=1 isn't penalized by compilation
    q1_shape(li.limit(1000))
    d2_core(docs.limit(50))
    t7_shape(docs.limit(50))
    cc_shape(docs.limit(50))
    d8_shape(docs.limit(50))
    x6_shape(docs.limit(50))
    d10_shape(docs.limit(50))
    t11_shape(docs.limit(50))
    a6_shape(embs.limit(50))
    t17_shape(docs.limit(50))
    m9_shape(docs.limit(50))
    d16_shape(docs.limit(50))
    print(f"{'op':10} {'R':>3} {'rows':>12} {'sec':>8} {'sec/R':>8}")
    for name, base, key, stride, fn in (
            ("q1_agg", li, "l_orderkey", 10_000_000, q1_shape),
            ("d2_core", docs, "doc_id", 1_000_000, d2_core),
            ("t7_stats", docs, "doc_id", 1_000_000, t7_shape),
            ("cc_iter", docs, "doc_id", 1_000_000, cc_shape),
            ("d8_incr", docs, "doc_id", 1_000_000, d8_shape),
            ("x6_shuf", docs, "doc_id", 1_000_000, x6_shape),
            ("d10_boil", docs, "doc_id", 1_000_000, d10_shape),
            ("t11_bpe", docs, "doc_id", 1_000_000, t11_shape),
            ("a6_lloyd", embs, "vec_id", 1_000_000, a6_shape),
            ("t17_lm", docs, "doc_id", 1_000_000, t17_shape),
            ("m9_pack", docs, "doc_id", 1_000_000, m9_shape),
            ("d16_cdc", docs, "doc_id", 1_000_000, d16_shape)):
        for r in (1, 4, 16):
            # persist the amplified input: a real R×-sized table is
            # materialized storage, while the amplify() union would
            # otherwise be re-scanned once per plan subtree (an op
            # with nested broadcasts re-reads it 3×, charging harness
            # cost to the operator)
            df = amplify(base, r, key, stride).persist()
            n = df.count()
            t0 = time.perf_counter()
            fn(df)
            dt = time.perf_counter() - t0
            df.unpersist()
            print(f"{name:10} {r:>3} {n:>12} {dt:>8.2f} {dt / r:>8.2f}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
