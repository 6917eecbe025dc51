"""Behavioral pins for the round-7 Unicode text surface (t18, d19)
and the Unicode tokenizer option.

The synthetic corpus is ASCII-only, so non-Latin behavior is pinned
on the deterministic planted docs (functions.text.UNICODE_PLANTS)
that both engines union into the corpus."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_t18_script_id_plants(spark):
    """Every planted doc classifies to its script; the ASCII corpus
    classifies latin/other only."""
    from postgres_scanner_spark.functions.text import t18_script_id
    df = t18_script_id(spark, SF)
    got = {r.doc_id: r.script for r in
           df.filter("doc_id >= 910000").collect()}
    assert got == {910001: "han", 910002: "han", 910003: "han",
                   910004: "han", 910005: "kana", 910006: "kana",
                   910007: "hangul", 910008: "hangul",
                   910009: "arabic", 910010: "arabic",
                   910011: "cyrillic"}
    corpus = set(r.script for r in
                 df.filter("doc_id < 910000").collect())
    assert corpus <= {"latin", "other"}


def test_t18_oracle_parity(spark):
    from postgres_scanner_spark.functions.text import (
        t18_script_id, _T18_SQL,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("t18", t18_script_id(spark, SF),
                           _T18_SQL, SF)
    assert ok, problems


def test_d19_finds_planted_cjk_dups(spark):
    """The char-gram branch recovers the planted Chinese exact dup
    (jaccard 1.0) and the one-char-off near-dup; the whitespace
    word-shingler CANNOT see these (a space-free doc is one 'word'),
    which is the whole point of the operator."""
    from postgres_scanner_spark.operators.dedup import (
        d19_unicode_shingle_dedup,
    )
    df = d19_unicode_shingle_dedup(spark, SF)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in
           df.filter("doc_a >= 910000").collect()}
    assert got[(910001, 910003)] == 1.0          # exact dup
    assert 0.5 <= got[(910001, 910002)] < 1.0    # near-dup
    assert 0.5 <= got[(910002, 910003)] < 1.0
    # unrelated CJK docs (different text) must NOT pair
    assert not any(910004 in p or 910005 in p for p in got)


@pytest.mark.slow
def test_d19_oracle_parity(spark):
    from postgres_scanner_spark.operators.dedup import (
        d19_unicode_shingle_dedup, _d19_sql,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("d19", d19_unicode_shingle_dedup(spark, SF),
                           _d19_sql(), SF)
    assert ok, problems


def test_unicode_tokenizer_option(spark):
    """_tokens(unicode_mode=True) splits on Unicode categories:
    Arabic/Cyrillic words tokenize, punctuation separates, empties
    drop. Default mode is byte-for-byte the old whitespace split
    (oracle-pinned queries must not drift)."""
    from postgres_scanner_spark.operators.dedup import _tokens
    df = spark.createDataFrame(
        [("Привет, мир! данные",),
         ("التعلم الآلي،ممتع",),     # Arabic comma, no space
         ("a  b",)],                  # double space
        "text STRING")
    uni = [r.t for r in df.select(_tokens(True).alias("t")).collect()]
    assert uni[0] == ["привет", "мир", "данные"]
    assert uni[1] == ["التعلم", "الآلي", "ممتع"]   # comma split it
    assert uni[2] == ["a", "b"]                    # no empty token
    ws = [r.t for r in df.select(_tokens().alias("t")).collect()]
    assert ws[2] == ["a", "", "b"]                 # legacy behavior
    assert ws[1] == ["التعلم", "الآلي،ممتع"]       # ASCII split can't


@pytest.mark.slow
def test_d19_word_branch_uses_unicode_tokens(spark):
    """A Cyrillic near-dup pair separated only by punctuation
    placement still pairs through the word branch (the ASCII
    tokenizer would glue punctuation onto tokens and break the
    shingle match)."""
    from postgres_scanner_spark.functions import text as tx
    from postgres_scanner_spark.operators import dedup as dd
    plants = tx.UNICODE_PLANTS
    extra = [
        (920001, "машинное обучение, требует качественных данных обучения"),
        (920002, "машинное обучение требует качественных данных обучения"),
    ]
    tx.UNICODE_PLANTS = plants + extra
    try:
        df = dd.d19_unicode_shingle_dedup(spark, SF)
        got = {(r.doc_a, r.doc_b): r.jaccard for r in
               df.filter("doc_a >= 920000").collect()}
        assert (920001, 920002) in got
        assert got[(920001, 920002)] >= 0.5
    finally:
        tx.UNICODE_PLANTS = plants


def test_t19_kl_properties(spark):
    """KL(source ‖ corpus) is non-negative for every source (Gibbs),
    one row per source, and the per-source token masses add up to
    the corpus token count."""
    from postgres_scanner_spark.functions.text import (
        t19_source_kl_divergence, _tokens,
    )
    from postgres_scanner_spark import tables
    df = t19_source_kl_divergence(spark, SF).collect()
    assert all(r.kl_nats >= 0 for r in df)
    d = tables.load(spark, SF, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(df) == n_sources
    n_tok = (d.select(F.explode(_tokens()).alias("w"))
             .filter("w <> ''").count())
    assert sum(r.n_tokens for r in df) == n_tok


def test_t19_oracle_parity(spark):
    from postgres_scanner_spark.functions.text import (
        t19_source_kl_divergence, _T19_SQL,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("t19", t19_source_kl_divergence(spark, SF),
                           _T19_SQL, SF)
    assert ok, problems


def test_m12_prunes_and_reads_only_selected(spark):
    """500 docs (ids 0..499) at 64 rows/group → 8 groups; the probe
    [mx//4, mx//2+mx//8] = [124, 311] must select exactly groups
    1–4, count every id in range once, and report zero matches on
    unselected groups (which the pruned read never opens)."""
    from postgres_scanner_spark.operators.multimodal import (
        m12_pruned_rowgroup_scan,
    )
    rows = m12_pruned_rowgroup_scan(spark, SF).collect()
    assert len(rows) == 8
    assert [r.rg_id for r in rows] == list(range(8))
    assert {r.rg_id for r in rows if r.selected} == {1, 2, 3, 4}
    assert sum(r.n_matched for r in rows) == 311 - 124 + 1
    assert sum(r.key_sum for r in rows) == sum(range(124, 312))
    for r in rows:
        if not r.selected:
            assert r.n_matched == 0 and r.key_sum == 0
    # zone maps are sound and the layout is key-sorted: contiguous,
    # non-overlapping [min,max] spans
    for a, b in zip(rows, rows[1:]):
        assert a.key_max < b.key_min


def test_m12_oracle_parity(spark):
    from postgres_scanner_spark.operators.multimodal import (
        m12_pruned_rowgroup_scan, _M12_SQL,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("m12", m12_pruned_rowgroup_scan(spark, SF),
                           _M12_SQL, SF)
    assert ok, problems


@pytest.mark.slow
def test_e22_guard_quarantines_eval_overlap(spark):
    """Every streamed doc lands exactly once (kept + quarantined =
    stream size incl. the planted re-deliveries); every src0 doc with
    >= 5 words self-hits the eval index, so quarantine is at least
    that large; clean docs exist too."""
    from postgres_scanner_spark.streaming.events import (
        e22_streaming_contamination_guard,
    )
    from postgres_scanner_spark import tables
    rows = e22_streaming_contamination_guard(spark, SF).collect()
    d = tables.load(spark, SF, "documents")
    n = d.count()
    streamed = n + 10 + 10 + 2          # staged re-deliveries
    assert sum(r.n_kept + r.n_quarantined for r in rows) == streamed
    src0_big = d.filter(
        "source = 'src0' AND size(split(lower(text), ' ')) >= 5").count()
    assert sum(r.n_quarantined for r in rows) >= src0_big
    assert sum(r.n_kept for r in rows) > 0


@pytest.mark.slow
def test_e22_oracle_parity(spark):
    from postgres_scanner_spark.streaming.events import (
        e22_streaming_contamination_guard, _e22_sql,
    )
    from tests.oracle_harness import compare
    ok, problems = compare(
        "e22", e22_streaming_contamination_guard(spark, SF),
        _e22_sql(), SF)
    assert ok, problems


@pytest.mark.slow
def test_a12_ivfpq_properties(spark):
    """IVF-PQ returns TOP_K rows per query, every neighbor comes
    from a probed coarse list, and recall@3 vs the exact baseline
    (a1) is positive — the composite index finds real neighbors,
    not artifacts of its own quantization."""
    from postgres_scanner_spark.operators.ann import (
        N_QUERIES, TOP_K, a1_cosine_topk, a12_ivfpq_ann,
    )
    got = a12_ivfpq_ann(spark, SF).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(per_q) == set(range(N_QUERIES))
    assert all(len(v) == TOP_K for v in per_q.values())
    exact = a1_cosine_topk(spark, SF).collect()
    ex_q = {}
    for r in exact:
        ex_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(set(per_q[q]) & ex_q[q]) for q in per_q)
    assert hits > 0          # composite quantizer finds true neighbors
    # no neighbor is a query vector; ranks are 1..TOP_K
    assert all(r.neighbor_id >= N_QUERIES for r in got)
    assert sorted(r.rank for r in got if r.query_id == 0) == [1, 2, 3]


@pytest.mark.slow
def test_a12_oracle_parity(spark):
    from postgres_scanner_spark.operators.ann import (
        a12_ivfpq_ann, _a12_sql,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("a12", a12_ivfpq_ann(spark, SF),
                           _a12_sql(), SF)
    assert ok, problems


@pytest.mark.slow
def test_w20_directional_asof_properties(spark):
    """Direction algebra: nearest matches exactly when either
    direction does (n_near = |bg∪fg| per user), the nearest gap sum
    can never exceed the backward sum where both are defined, and
    every purchase row is accounted for vs w6's backward-only join."""
    from postgres_scanner_spark.functions.analytics import (
        w6_asof_join, w20_asof_directional,
    )
    rows = w20_asof_directional(spark, SF).collect()
    assert rows, "no purchase users at this SF"
    for r in rows:
        assert max(r.n_back, r.n_fwd) <= r.n_near <= r.n_back + r.n_fwd
        assert r.n_near <= r.n_purchases
        assert r.sum_near_gap_us >= 0
    w6 = {r.user_id: r.n_purchases for r in w6_asof_join(spark, SF).collect()}
    w20 = {r.user_id: r.n_purchases for r in rows}
    assert w20 == w6          # same purchase universe as the w6 join


@pytest.mark.slow
def test_w20_oracle_parity(spark):
    from postgres_scanner_spark.functions.analytics import (
        w20_asof_directional, _W20_SQL,
    )
    from tests.oracle_harness import compare
    ok, problems = compare("w20", w20_asof_directional(spark, SF),
                           _W20_SQL, SF)
    assert ok, problems
