"""Scratch-persist lifecycle for operator intermediates.

Several operators persist intermediates that are read more than once
within one query (minhash signatures, inverted indexes, IVF lists).
Left in the session CacheManager, those entries slow every
*subsequent* query: each new plan is canonicalized and compared
against every cached plan for subsumption, and the dedup plans are
enormous trees (measured: a 0.7 s ANN query degrades to ~2.4 s after
one LSH-dedup run at sf0.1).

`scratch_persist` is a drop-in persist() that records the DataFrame;
`release_scratch()` unpersists everything recorded. The query
registry (__spark_entry__) releases at the START of each query
construction, so one operator's scratch never outlives the next
query — no cooperation needed from the external driver. Unpersist
never affects correctness (lineage recomputes), only reuse within
the query that created it, which has already executed by then.

The shared table cache (tables.py) is deliberately NOT scratch — it
is meant to live for the whole bench session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def scratch_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release before the next query."""
    df.persist()
    _SCRATCH.append(df)
    return df


def release_scratch() -> int:
    """Unpersist every scratch DataFrame; returns how many."""
    n = len(_SCRATCH)
    while _SCRATCH:
        df = _SCRATCH.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    return n
