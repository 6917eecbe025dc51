"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — every implemented operator from SURVEY.md §2.
oracle_sql()   — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from postgres_scanner_spark.functions import tpch  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _collect_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    out.update(tpch.QUERIES)
    for mod_name in ("postgres_scanner_spark.functions.scanq",
                     "postgres_scanner_spark.functions.text",
                     "postgres_scanner_spark.functions.analytics",
                     "postgres_scanner_spark.operators.dedup",
                     "postgres_scanner_spark.operators.ann",
                     "postgres_scanner_spark.operators.multimodal",
                     "postgres_scanner_spark.streaming.events"):
        try:
            import importlib
            mod = importlib.import_module(mod_name)
            out.update(getattr(mod, "QUERIES", {}))
        except ImportError:
            pass
    return out


def _collect_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tpch.ORACLE)
    for mod_name in ("postgres_scanner_spark.functions.scanq",
                     "postgres_scanner_spark.functions.text",
                     "postgres_scanner_spark.functions.analytics",
                     "postgres_scanner_spark.operators.dedup",
                     "postgres_scanner_spark.operators.ann",
                     "postgres_scanner_spark.operators.multimodal",
                     "postgres_scanner_spark.streaming.events"):
        try:
            import importlib
            mod = importlib.import_module(mod_name)
            out.update(getattr(mod, "ORACLE", {}))
        except ImportError:
            pass
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect_queries()


def oracle_sql() -> dict[str, str]:
    return _collect_oracle()
