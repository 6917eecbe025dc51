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

import threading

from pyspark.sql import DataFrame

# Scratch is tracked PER THREAD: a parallel gate (tools/gate_check.py
# --jobs N) runs queries on concurrent worker threads, and a global
# list would let worker A's start-of-query release unpersist worker
# B's in-flight intermediates (correct — lineage recomputes — but it
# defeats the persist). Thread-local keeps the single-threaded
# contract identical while bounding live scratch to one query's worth
# per worker.
_TL = threading.local()


def _bucket() -> list[DataFrame]:
    b = getattr(_TL, "scratch", None)
    if b is None:
        b = _TL.scratch = []
    return b


def scratch_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release before the next query."""
    df.persist()
    _bucket().append(df)
    return df


def release_scratch() -> int:
    """Unpersist every scratch DataFrame recorded by THIS thread;
    returns how many."""
    b = _bucket()
    n = len(b)
    while b:
        df = b.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    return n
