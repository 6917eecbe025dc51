"""Operator-differential fuzz: hypothesis-generated tiny corpora,
the Spark OPERATOR vs its own DuckDB oracle, exact row equality.

The r10 additions carry the engine's hairiest cross-engine logic —
t21's Viterbi DP (float score sums, FLOOR comparison keys, seg-string
tie-breaks, equal-product segmentations) and d23's span/piece integer
arithmetic (pad clipping, island merges, edge-touching pieces). The
hand pins cover the branches a human thought of; this file searches
the neighborhood: tiny alphabets maximize seed/segmentation TIES for
t21, and d23's generator plants eval-slice runs of lengths straddling
the 13-gram threshold at random offsets (doc start / end / whole-doc
/ multiple runs) so clipping and piece-counting edges are hit from
every side."""

from __future__ import annotations

import shutil
import uuid

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# hypothesis fuzzers = the verify-window tail (r13): excluded from
# the default run, still gate every round via -m slow
pytestmark = pytest.mark.slow



def _write_docs(rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = f"/tmp/opfuzz_{uuid.uuid4().hex}"
    import os
    os.makedirs(d)
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")
    return d


def _oracle(sql_text, sf_dir):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        return con.execute(sql_text).fetchall()
    finally:
        con.close()


@st.composite
def _t21_corpora(draw):
    # alphabet of 3 chars → maximal piece-count collisions → the DP
    # hits equal-product ties ({2,6} vs {3,4}) and rounded-score
    # boundaries far more often than organic text would
    word = st.text(alphabet="abc", min_size=1, max_size=8)
    docs = draw(st.lists(st.lists(word, min_size=1, max_size=8),
                         min_size=1, max_size=6))
    return [{"doc_id": i, "text": " ".join(ws), "lang": "en",
             "source": "s", "n_chars": 1} for i, ws in enumerate(docs)]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_t21_corpora())
def test_t21_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.functions.text import (
        t21_unigram_lm_train, _T21_SQL)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     t21_unigram_lm_train(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_T21_SQL, d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _d23_corpora(draw):
    # one eval doc (src0) of 20-40 distinct tokens; train docs are
    # random interleavings of eval SLICES (lengths 8-20 straddle the
    # 13-gram threshold) and unique fillers — hits can sit at doc
    # start, doc end, back-to-back, or cover the whole doc
    ev_len = draw(st.integers(20, 40))
    ev = [f"e{i}" for i in range(ev_len)]
    fresh = iter(range(10000))
    n_train = draw(st.integers(1, 5))
    rows = [{"doc_id": 0, "text": " ".join(ev), "lang": "en",
             "source": "src0", "n_chars": 1}]
    for t in range(n_train):
        parts = []
        for _ in range(draw(st.integers(1, 4))):
            if draw(st.booleans()):
                ln = draw(st.integers(8, 20))
                start = draw(st.integers(0, max(0, ev_len - ln)))
                parts.extend(ev[start:start + ln])
            else:
                parts.extend(f"f{next(fresh)}"
                             for _ in range(draw(st.integers(1, 15))))
        rows.append({"doc_id": t + 1, "text": " ".join(parts),
                     "lang": "en", "source": "src1", "n_chars": 1})
    return rows


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_d23_corpora())
def test_d23_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.operators.dedup import (
        d23_benchmark_span_excision, _d23_sql)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     d23_benchmark_span_excision(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_d23_sql(), d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _random_graphs(draw):
    n = draw(st.integers(2, 40))
    ids = draw(st.lists(st.integers(0, 10_000), min_size=n, max_size=n,
                        unique=True))
    m = draw(st.integers(0, 60))
    edges = [(ids[draw(st.integers(0, n - 1))],
              ids[draw(st.integers(0, n - 1))]) for _ in range(m)]
    return ids, edges


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(g=_random_graphs())
def test_d24_fuzz_matches_union_find(spark, g):
    """LS/SS on arbitrary random multigraphs (self-loops, duplicate
    edges, disconnected nodes) vs a 10-line union-find: every node's
    label must be its component minimum, within the 8-round cap."""
    from postgres_scanner_spark.operators.dedup import _d24_labels
    ids, edges = g
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {i: find(i) for i in ids}
    ndf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edf = (spark.createDataFrame(edges or [(ids[0], ids[0])],
                                 "src long, dst long"))
    got = {r.doc_id: r.lbl for r in _d24_labels(ndf, edf).collect()}
    assert got == want, (edges, got, want)


# ---------------------------------------------------------------------
# r11: d25 chunk-grain clustering + d26 NearDup apply + t22 encode
# ---------------------------------------------------------------------

@st.composite
def _shared_block_corpora(draw):
    """Documents assembled from a small pool of word BLOCKS, so
    random corpora share chunk/shingle runs with high probability —
    the regime where d25's chunk graph and d26's near-dup graph have
    nontrivial transitive structure (random text would produce only
    the plant edges)."""
    n_blocks = draw(st.integers(2, 4))
    blocks = [" ".join(f"b{k}w{i}" for i in range(draw(st.integers(8, 24))))
              for k in range(n_blocks)]
    docs = draw(st.lists(
        st.lists(st.integers(0, n_blocks - 1), min_size=1, max_size=3),
        min_size=1, max_size=6))
    return [{"doc_id": i, "text": " ".join(blocks[k] for k in ks),
             "lang": "en", "source": "s", "n_chars": 1}
            for i, ks in enumerate(docs)]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_shared_block_corpora())
def test_d25_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.operators.dedup import (
        _D25_SQL, d25_chunk_cluster)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     d25_chunk_cluster(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_D25_SQL, d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_shared_block_corpora())
def test_d26_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.operators.dedup import (
        _d26_sql, d26_neardup_apply)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     d26_neardup_apply(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_d26_sql(), d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_t21_corpora())
def test_t22_fuzz_matches_oracle(spark, rows):
    """T22 reuses t21's tie-maximizing tiny-alphabet corpora: the
    encode DP must resolve the same score ties the trainer does,
    plus the char-fallback path for any word the corpus pushes past
    the trained length (none here — alphabet caps at 8 — but the
    shared-CTE oracle replays end to end)."""
    from postgres_scanner_spark.functions.text import (
        _T22_SQL, t22_unigram_lm_encode)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     t22_unigram_lm_encode(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_T22_SQL, d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------- r12
@st.composite
def _labeled_corpora(draw):
    # tiny alphabet → maximal md5-bucket collisions; sources split
    # across the weak-label boundary (src0 = positive) including
    # all-positive / all-negative corpora, where g2 = ±Σc and the
    # clamp arms of T23's weight quantizer are hit
    word = st.text(alphabet="abc", min_size=1, max_size=6)
    docs = draw(st.lists(st.lists(word, min_size=1, max_size=8),
                         min_size=1, max_size=8))
    srcs = draw(st.lists(st.sampled_from(["src0", "src1", "src2"]),
                         min_size=len(docs), max_size=len(docs)))
    return [{"doc_id": i, "text": " ".join(ws), "lang": "en",
             "source": srcs[i], "n_chars": 1}
            for i, ws in enumerate(docs)]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_labeled_corpora())
def test_t23_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.functions.text import (
        _T23_SQL, t23_classifier_train)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     t23_classifier_train(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_T23_SQL, d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_labeled_corpora())
def test_t24_fuzz_matches_oracle(spark, rows):
    from postgres_scanner_spark.functions.text import (
        _T24_SQL, t24_classifier_apply)
    d = _write_docs(rows)
    try:
        got = sorted(tuple(r) for r in
                     t24_classifier_apply(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(_T24_SQL, d))
        assert got == exp, (rows, got, exp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _byte_signal_corpora(draw):
    # ≥65-char texts over a 2-4 letter alphabet: dHash bands
    # concentrate maximally (the hot-bucket regime), plus exact
    # repeats so the banded join always has work; the hot-path cap is
    # drawn too — 0 forces EVERY bucket down the sub-band refinement,
    # and the oracle (cap-independent by the pigeonhole recursion)
    # must agree regardless
    alpha = draw(st.sampled_from(["ab", "abc", "abcd"]))
    n = draw(st.integers(min_value=2, max_value=8))
    texts = [
        "".join(draw(st.sampled_from(alpha))
                for _ in range(draw(st.integers(65, 90))))
        for _ in range(n)]
    if draw(st.booleans()) and texts:
        texts.append(texts[0])          # exact repeat
    cap = draw(st.sampled_from([0, 2, 64]))
    return [{"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)} for i, t in enumerate(texts)], cap


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rc=_byte_signal_corpora())
def test_m15_fuzz_matches_oracle(spark, rc):
    from postgres_scanner_spark.operators import multimodal as mm
    rows, cap = rc
    d = _write_docs(rows)
    old = mm._M15_MAX_DF
    try:
        mm._M15_MAX_DF = cap
        got = sorted(tuple(r) for r in
                     mm.m15_dhash_neardup(spark, d).collect())
        exp = sorted(tuple(r) for r in _oracle(mm._m15_sql(), d))
        assert got == exp, (rows, cap, got, exp)
    finally:
        mm._M15_MAX_DF = old
        shutil.rmtree(d, ignore_errors=True)


def _write_embeddings(vecs):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = f"/tmp/opfuzz_{uuid.uuid4().hex}"
    os.makedirs(d)
    rows = [{"vec_id": i, "embedding": v, "label": "l"}
            for i, v in enumerate(vecs)]
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/embeddings.parquet")
    return d


@st.composite
def _tied_embeddings(draw):
    # coordinates from a 5-value set → massive projection-score and
    # distance TIES (the rank tie-break and lower-centroid-id rules
    # are what's on trial); dim 0 forced nonzero so norms never
    # vanish; the leaf target S is drawn down to 2 to force deep
    # balanced splits on tiny corpora
    n = draw(st.integers(min_value=2, max_value=24))
    vals = [0.0, 0.5, 1.0, -1.0, 0.25]
    vecs = [[draw(st.sampled_from(vals)) for _ in range(64)]
            for _ in range(n)]
    for v in vecs:
        v[0] = draw(st.sampled_from([1.0, 0.5, -1.0]))
    s = draw(st.sampled_from([2, 8, 64]))
    return vecs, s


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(vs=_tied_embeddings())
def test_d27_fuzz_matches_oracle(spark, vs):
    from postgres_scanner_spark.operators import dedup as dd
    vecs, s = vs
    d = _write_embeddings(vecs)
    old = dd._D27_S
    try:
        dd._D27_S = s
        got = sorted(tuple(r) for r in
                     dd.d27_scaled_semantic_dedup(spark, d).collect())
        con = duckdb.connect()
        try:
            con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                        f"'{d}/embeddings.parquet'")
            exp = sorted(tuple(r) for r in
                         con.execute(dd._d27_sql()).fetchall())
        finally:
            con.close()
        assert got == exp, (vecs, s, got, exp)
    finally:
        dd._D27_S = old
        shutil.rmtree(d, ignore_errors=True)
# Appended to tests/test_operator_fuzz.py after the suite run.


def _write_events_fuzz(rows):
    """rows: (event_id, us, event_type, value)."""
    import datetime as dt
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = f"/tmp/opfuzz_{uuid.uuid4().hex}"
    os.makedirs(d)
    tbl = pa.Table.from_pylist(
        [{"event_id": i, "ts": dt.datetime(1970, 1, 1)
          + dt.timedelta(microseconds=us),
          "user_id": i % 3, "event_type": et, "value": v,
          "props": "{}"}
         for i, us, et, v in rows],
        schema=pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())]))
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


def _oracle_events(sql_text, sf_dir):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        return con.execute(sql_text).fetchall()
    finally:
        con.close()


@st.composite
def _ltob_series(draw):
    # values from a 3-point set and REPEATED timestamps maximize
    # exact area ties (the FLOOR key + (x, event_id) tie-break is
    # the cross-engine hazard); lumpy micros leave buckets empty so
    # the edge-stitch path runs constantly
    n = draw(st.integers(min_value=2, max_value=36))
    rows = []
    for i in range(n):
        us = draw(st.integers(min_value=0, max_value=4000))
        et = draw(st.sampled_from(["a", "b"]))
        v = draw(st.sampled_from([0.0, 1.0, 100.0]))
        rows.append((i, us * 997, et, v))
    return rows


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_ltob_series())
def test_w22_fuzz_matches_oracle(spark, rows):
    """LTOB vs its oracle on random spiky series: repeated x values,
    forced equal-area ties, empty buckets, 1- and 2-point types."""
    from postgres_scanner_spark.functions import analytics as an
    d = _write_events_fuzz(rows)
    try:
        got = [tuple(r) for r in
               an.w22_ltob_downsample(spark, d).collect()]
        want = [tuple(r) for r in
                _oracle_events(an._W22_SQL, d)]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _x19_corpora(draw):
    # tiny vocabulary → masses of equal counts → the top-K boundary
    # tie-break (cnt DESC, tk) is exercised on almost every draw
    word = st.sampled_from([f"w{i}" for i in range(30)])
    docs = draw(st.lists(st.lists(word, min_size=1, max_size=20),
                         min_size=1, max_size=8))
    return [{"doc_id": i, "text": " ".join(ws), "lang": "en",
             "source": "s", "n_chars": 1} for i, ws in enumerate(docs)]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_x19_corpora())
def test_x19_fuzz_matches_oracle(spark, rows):
    """CMS grid + top-K estimates vs the oracle on tie-heavy tiny
    vocabularies (the K-boundary ordering is the hazard; the grid
    arithmetic is integer-exact by construction)."""
    from postgres_scanner_spark.functions import analytics as an
    d = _write_docs(rows)
    try:
        got = [tuple(r) for r in
               an.x19_cms_heavy_hitters(spark, d).collect()]
        want = [tuple(r) for r in _oracle(an._X19_SQL, d)]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _x20_corpora(draw):
    # short shared phrases across sources: 5-gram overlap appears
    # only when docs genuinely share a 5-window, so draws cover
    # zero-overlap pairs, partial overlap, and identical sources
    word = st.sampled_from([f"t{i}" for i in range(12)])
    docs = draw(st.lists(
        st.tuples(st.sampled_from(["sa", "sb", "sc"]),
                  st.lists(word, min_size=5, max_size=14)),
        min_size=1, max_size=8))
    return [{"doc_id": i, "text": " ".join(ws), "lang": "en",
             "source": src, "n_chars": 1}
            for i, (src, ws) in enumerate(docs)]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_x20_corpora())
def test_x20_fuzz_matches_oracle(spark, rows):
    """Source-overlap matrix vs the oracle on random tiny corpora:
    the full pair grid (including absent sources and zero-overlap
    pairs) must match exactly."""
    from postgres_scanner_spark.functions import analytics as an
    d = _write_docs(rows)
    try:
        got = [tuple(r) for r in
               an.x20_source_overlap_matrix(spark, d).collect()]
        want = [tuple(r) for r in
                _oracle(an.ORACLE["x20_source_overlap_matrix"], d)]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@st.composite
def _t25_corpora(draw):
    # 4-word vocabulary with 10-25-token docs: most of the 16
    # possible bigrams clear the support floor, and the tiny float
    # range puts many pairs on the SAME rounded PMI key — the
    # (ak, w1, w2) ordering is the cross-engine hazard
    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    docs = draw(st.lists(st.lists(word, min_size=10, max_size=25),
                         min_size=2, max_size=8))
    return [{"doc_id": i, "text": " ".join(ws), "lang": "en",
             "source": "s", "n_chars": 1} for i, ws in enumerate(docs)]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(rows=_t25_corpora())
def test_t25_fuzz_matches_oracle(spark, rows):
    """PMI collocations vs the oracle on tie-dense tiny-vocabulary
    corpora (identical rounded keys force the (w1, w2) tiebreak)."""
    from postgres_scanner_spark.functions import text as tx
    d = _write_docs(rows)
    try:
        got = [tuple(r) for r in
               tx.t25_pmi_collocations(spark, d).collect()]
        want = [tuple(r) for r in _oracle(tx._T25_SQL, d)]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
