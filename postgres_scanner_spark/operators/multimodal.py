"""Multimodal binary-column operators (SURVEY.md §2 M1-M2).

Treats media as opaque `binary` columns with typed metadata, the way
a 100 TB training-data lake stores images/audio/video next to text.
The codec libraries aren't in this container, so the decode kernel is
a clearly-marked deterministic stub — but the Spark-side plumbing is
real: binary schema, Arrow-batched mapInPandas with an explicit
output schema, and per-batch vectorized processing.

No SQL oracle (mapInPandas pipelines are not SQL-expressible) —
driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 64      # fake "frame" size for M2
FRAME_STRIDE = 4      # sample every 4th frame


def _binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a binary payload + typed metadata —
    the schema a real image/audio column would carry."""
    from .. import tables
    tables.ensure_session_defaults(spark)
    d = tables.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB for a media decoder (image resize / audio features).

    Real deployments plug PIL/ffmpeg here; the container has neither,
    so this computes deterministic fake 'features' from the raw bytes
    while exercising the identical batch plumbing.
    """
    import hashlib
    arr = bytearray(payload)
    return {
        "n_bytes": len(arr),
        "checksum": hashlib.md5(payload).hexdigest(),
        "byte_mean": (sum(arr) / len(arr)) if arr else 0.0,
    }


_M1_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("mime", T.StringType()),
])


def m1_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → per-item features via Arrow-batched
    mapInPandas. Batch shape: whole partitions stream through in
    pandas chunks; no per-row Python overhead beyond the stub."""
    corpus = _binary_corpus(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: executors may not have the package
        # on sys.path (cloudpickle must serialize everything by value)
        import hashlib

        def stub(payload):
            arr = bytearray(payload)
            return {
                "n_bytes": len(arr),
                "checksum": hashlib.md5(bytes(payload)).hexdigest(),
                "byte_mean": (sum(arr) / len(arr)) if arr else 0.0,
            }

        for pdf in batches:
            feats = pdf["payload"].map(stub)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
                "byte_mean": [f["byte_mean"] for f in feats],
                "mime": [m["mime"] for m in pdf["meta"]],
            })

    return (
        corpus.mapInPandas(decode, schema=_M1_SCHEMA)
        .orderBy("doc_id")
    )


_M2_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_len", T.IntegerType()),
    T.StructField("frame_checksum", T.StringType()),
])


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary 'video' column: split payload
    into FRAME_BYTES frames, keep every FRAME_STRIDE-th, emit one row
    per sampled frame (fan-out inside mapInPandas — the decode stub
    stands in for an actual frame decoder)."""
    corpus = _binary_corpus(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [],
                    "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(len(frame))
                    rows["frame_checksum"].append(
                        hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(rows)

    return (
        corpus.mapInPandas(sample, schema=_M2_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


QUERIES = {
    "m1_decode_features": m1_decode_features,
    "m2_frame_sample": m2_frame_sample,
}

ORACLE: dict[str, str] = {}
