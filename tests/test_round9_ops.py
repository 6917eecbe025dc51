"""Behavioral pins for the round-9 additions.

D20's distinguishing properties vs the existing dedup surface:
GLOBAL marking (the original is marked, not just the later copy —
no a<b pair asymmetry) and NO frequency cap (a block pasted into 20
docs surfaces in all 20; D11's df-cap would drop such a hot phrase).
The span algebra (runs of duplicated K-grams, >= MIN_SPAN filter,
interval union) is pinned against hand-computable plants.
"""

SF = "/root/testdata/sf0.001"


def _d20(spark):
    from postgres_scanner_spark.operators.dedup import (
        _D20_MIN_SPAN, d20_repeated_substrings)
    rows = d20_repeated_substrings(spark, SF).collect()
    return {r.doc_id: r for r in rows}, _D20_MIN_SPAN


def test_d20_marks_original_and_copy(spark):
    """Tokens 1-20 of docs 0-9 are embedded in fresh docs 400000+i:
    the GLOBAL miner must mark the span in BOTH directions — the
    planted copy and the untouched original."""
    by_id, _ = _d20(spark)
    for i in range(10):
        assert 400000 + i in by_id, f"copy of doc {i} unmarked"
        assert by_id[400000 + i].dup_tokens >= 20
        assert i in by_id, f"original doc {i} unmarked"
        assert by_id[i].dup_tokens >= 20


def test_d20_hot_block_survives_no_df_cap(spark):
    """The 15-token boilerplate block appears in 20 docs — a
    document-frequency cap (D11's hot-phrase guard) would drop it;
    the global method must report every occurrence."""
    by_id, _ = _d20(spark)
    for i in range(20):
        r = by_id.get(401000 + i)
        assert r is not None, f"boilerplate doc {401000 + i} unmarked"
        assert r.dup_tokens == 15 and r.n_spans == 1, r


def test_d20_span_algebra_invariants(spark):
    """Every reported doc satisfies the span algebra: merged
    intervals are each >= MIN_SPAN tokens, disjoint (so
    dup_tokens >= n_spans * MIN_SPAN), and bounded by the doc."""
    by_id, min_span = _d20(spark)
    assert by_id, "tiny corpus with plants must produce rows"
    for r in by_id.values():
        assert r.dup_tokens >= r.n_spans * min_span, r
        assert r.dup_tokens <= r.total_tokens, r
        assert abs(r.dup_frac - round(r.dup_tokens / r.total_tokens, 4)) \
            < 1e-9, r
