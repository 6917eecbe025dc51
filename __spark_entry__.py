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


# Registration order is cost order: cheap modules first so a driver
# wall-clock budget cut truncates the expensive dedup tail, not the
# cheap ann/events/multimodal entries (round-2 run lost a2/a3/e*/m*).
_MODULES = (
    # cheapest suites first: if a driver budget cut truncates the
    # correctness sweep, the expensive tails (streaming drains, dedup
    # joins) lose rows — not the wide cheap coverage
    "postgres_scanner_spark.functions.scanq",
    "postgres_scanner_spark.functions.text",
    "postgres_scanner_spark.functions.analytics",
    "postgres_scanner_spark.functions.tpcds",
    "postgres_scanner_spark.operators.ann",
    "postgres_scanner_spark.operators.multimodal",
    "postgres_scanner_spark.streaming.events",
    "postgres_scanner_spark.operators.dedup",
)


def _collect(attr: str) -> dict:
    import importlib
    import traceback
    out: dict = {}
    out.update(getattr(tpch, attr))
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
            out.update(getattr(mod, attr, {}))
        except ImportError:
            # a broken module must not silently drop its whole suite
            print(f"WARNING: {mod_name} failed to import; its "
                  f"{attr} entries are missing from the gate:\n"
                  f"{traceback.format_exc()}", file=sys.stderr)
    return out


def _wrap_release(fn: Callable) -> Callable:
    """Release the previous query's scratch-persisted intermediates
    before building the next plan: cached dedup intermediates left in
    the CacheManager slow every subsequent query (plan-subsumption
    checks against huge cached trees) — see runtime.py."""
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        from postgres_scanner_spark.runtime import release_scratch
        release_scratch()
        return fn(spark, sf_dir)
    return inner


def _collect_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap_release(v) for k, v in _collect("QUERIES").items()}


def _collect_oracle() -> dict[str, str]:
    return _collect("ORACLE")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect_queries()


def oracle_sql() -> dict[str, str]:
    return _collect_oracle()
