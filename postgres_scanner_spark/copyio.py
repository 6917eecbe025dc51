"""COPY TO / COPY FROM — bulk load & unload.

Parity with reference src/postgres_copy_to.cpp,
src/postgres_copy_from.cpp, src/postgres_binary_copy.cpp: the
reference streams PG's COPY wire format (text or binary). Spark's
native "binary wire" between engines is Arrow/Parquet — columnar,
typed, splittable — so:
  format="binary" → parquet  (the scalable path; Arrow-backed)
  format="text"   → csv      (COPY text-format parity, incl. NULL marker)
`pg_use_binary_copy` picks the default, same as the reference
(postgres_extension.cpp:162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .settings import SETTINGS

_TEXT_OPTS = {"header": "false", "nullValue": "\\N", "delimiter": "\t",
              "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]"}


def copy_to(df: DataFrame, path: str, *, format: str | None = None,
            mode: str = "overwrite") -> None:
    """COPY (SELECT ...) TO 'path' — distributed unload; every Spark
    partition writes its own file, which is exactly how the reference
    parallelizes COPY (one stream per task)."""
    fmt = format or ("binary" if SETTINGS.pg_use_binary_copy else "text")
    if SETTINGS.pg_null_byte_replacement is not None:
        # reference: pg_null_byte_replacement (postgres_extension.cpp:179)
        # — NUL bytes are illegal in PG text values; scrub string cols
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        repl = SETTINGS.pg_null_byte_replacement
        df = df.select(*[
            F.regexp_replace(F.col(f.name), "\x00", repl).alias(f.name)
            if isinstance(f.dataType, T.StringType) else F.col(f.name)
            for f in df.schema.fields
        ])
    if fmt == "binary":
        df.write.mode(mode).parquet(path)
    elif fmt == "text":
        w = df.write.mode(mode)
        for k, v in _TEXT_OPTS.items():
            w = w.option(k, v)
        w.csv(path)
    else:
        raise ValueError(f"unknown COPY format {fmt!r}")


def copy_from(spark: SparkSession, path: str, *, format: str | None = None,
              schema=None) -> DataFrame:
    """COPY table FROM 'path' — distributed load."""
    fmt = format or ("binary" if SETTINGS.pg_use_binary_copy else "text")
    if fmt == "binary":
        return spark.read.parquet(path)
    if fmt == "text":
        r = spark.read
        for k, v in _TEXT_OPTS.items():
            r = r.option(k, v)
        if schema is not None:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", "true")
        return r.csv(path)
    raise ValueError(f"unknown COPY format {fmt!r}")
