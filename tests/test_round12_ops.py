"""Round-12 operator truth pins: M15's two-level hot-bucket
re-banding (semantics-preserving — the hot path must return exactly
the naive path's pairs) and the plant-offset guard."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, name, texts, first_id=0, sources=None):
    rows = [{"doc_id": first_id + i, "text": t, "lang": "en",
             "source": (sources[i] if sources else "s"),
             "n_chars": len(t)}
            for i, t in enumerate(texts)]
    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return d


# ---------------------------------------------------------------------
# M15 hot-bucket re-banding
# ---------------------------------------------------------------------

@pytest.mark.slow
def test_m15_hot_path_equals_cold_path(spark, monkeypatch, tmp_path):
    """Force EVERY bucket down the sub-band refinement path
    (_M15_MAX_DF = 0) and require the result to be identical to the
    default run — the pigeonhole recursion must preserve candidate
    coverage exactly, not approximately."""
    from postgres_scanner_spark.operators import multimodal as mm
    ramp = "".join(chr(65 + (i % 26)) for i in range(100))
    texts = [ramp,                       # near-pair with the mutant
             ramp[:50] + "z" + ramp[51:],
             "".join(chr(65 + (i * 17 % 26)) for i in range(100)),
             "".join(chr(97 + (i * 5 % 26)) for i in range(120)),
             ramp[::-1]]
    d = _write_docs(tmp_path, "sfm15hot", texts)
    base = [tuple(r) for r in
            mm.m15_dhash_neardup(spark, str(d)).collect()]
    monkeypatch.setattr(mm, "_M15_MAX_DF", 0)
    hot = [tuple(r) for r in
           mm.m15_dhash_neardup(spark, str(d)).collect()]
    assert hot == base
    assert (0, 1) in {(a, b) for a, b, _ in base}


def test_m15_hot_path_on_real_corpus(spark, monkeypatch):
    """Same equivalence on the sf0.001 corpus (plants included):
    every planted copy/mutant pair survives the refinement path."""
    from postgres_scanner_spark.operators import multimodal as mm
    sf = "/root/testdata/sf0.001"
    base = [tuple(r) for r in mm.m15_dhash_neardup(spark, sf).collect()]
    monkeypatch.setattr(mm, "_M15_MAX_DF", 0)
    hot = [tuple(r) for r in mm.m15_dhash_neardup(spark, sf).collect()]
    assert hot == base and len(base) > 0


# ---------------------------------------------------------------------
# D27 scaled SemDeDup (balanced random-projection leaves)
# ---------------------------------------------------------------------

@pytest.mark.slow
def test_d27_matches_oracle_sf0001(spark):
    import duckdb
    from postgres_scanner_spark.operators.dedup import (
        _d27_sql, d27_scaled_semantic_dedup)
    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in d27_scaled_semantic_dedup(spark, sf).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = [tuple(r) for r in con.execute(_d27_sql()).fetchall()]
    assert got == want


def test_d27_small_leaves_match_oracle(spark, monkeypatch):
    """Shrinking the leaf target (S=8) forces many balanced splits on
    the 500-vector corpus; the oracle (regenerated with the same S)
    must still agree — the leaf-index arithmetic is what's on trial."""
    import duckdb
    from postgres_scanner_spark.operators import dedup as dd
    monkeypatch.setattr(dd, "_D27_S", 8)
    sf = "/root/testdata/sf0.001"
    got = [tuple(r)
           for r in dd.d27_scaled_semantic_dedup(spark, sf).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = [tuple(r) for r in con.execute(dd._d27_sql()).fetchall()]
    assert got == want


@pytest.mark.slow
def test_d27_plants_and_subset_of_d14(spark):
    """The planted high-similarity pairs — the regime the operator
    exists for — must ALL be recovered: every copy (+P) drops with
    its source as witness, every mutant (+2P) drops. Restricted to
    real ids, D27's drops must be a subset of D14's (leaves only
    shrink the candidate space; plants inherit clusters so D14's
    clustering is untouched)."""
    from postgres_scanner_spark.operators.dedup import (
        d14_semantic_dedup, d27_scaled_semantic_dedup)
    sf = "/root/testdata/sf0.001"
    rows = d27_scaled_semantic_dedup(spark, sf).collect()
    drops = {r.dropped_vec: r.kept_vec for r in rows}
    import pyarrow.parquet as pq
    p = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"])
    p = max(p.column(0).to_pylist()) + 1
    for i in range(10):
        assert drops.get(i + p) == i, f"copy plant {i}"
        assert i + 2 * p in drops, f"mutant plant {i}"
    d27_real = {v for v in drops if v < p}
    d14 = {r.dropped_vec for r in d14_semantic_dedup(spark, sf).collect()}
    assert d27_real <= d14


# ---------------------------------------------------------------------
# T23 classifier train / T24 apply (fastText-style, diagonal-Newton)
# ---------------------------------------------------------------------

def _t23_corpus(tmp_path, name):
    """aa/bb/cc/dd hash to distinct buckets 36/45/43/50 (asserted);
    5 positive 'dd' docs push that bucket past the weight clamp."""
    import hashlib
    hs = {w: int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64
          for w in ("aa", "bb", "cc", "dd")}
    assert len(set(hs.values())) == 4, hs
    texts = ["aa bb", "aa cc cc"] + ["dd"] * 5
    sources = ["src0", "src1"] + ["src0"] * 5
    return _write_docs(tmp_path, name, texts, sources=sources), hs


def test_t23_hand_truth(spark, tmp_path):
    """One diagonal-Newton step from w=0, computed by hand:
      h(aa): docs (y=1,c=1),(y=0,c=1) -> g2=0,  h4=6, wt=0
      h(dd): 5 docs (y=1,c=1)         -> g2=5,  h4=9, wt=clamp(1111)=1000
      h(bb): (y=1,c=1)                -> g2=1,  h4=5, wt=400
      h(cc): (y=0,c=2)                -> g2=-2, h4=8, wt=-500"""
    from postgres_scanner_spark.functions.text import t23_classifier_train
    d, hs = _t23_corpus(tmp_path, "sft23")
    got = {r.h: (r.n_docs, r.n_tokens, r.g2, r.h4, r.wt)
           for r in t23_classifier_train(spark, str(d)).collect()}
    assert got == {hs["aa"]: (2, 2, 0, 6, 0),
                   hs["dd"]: (5, 5, 5, 9, 1000),
                   hs["bb"]: (1, 1, 1, 5, 400),
                   hs["cc"]: (1, 2, -2, 8, -500)}


def test_t24_hand_truth(spark, tmp_path):
    """Scores with the trained layer: doc0 = 400 (T,T), doc1 = -1000
    (F,F), dd docs = 1000 each (T,T) -> perfect confusion matrix."""
    from postgres_scanner_spark.functions.text import t24_classifier_apply
    d, _ = _t23_corpus(tmp_path, "sft24")
    got = [tuple(r) for r in t24_classifier_apply(spark, str(d)).collect()]
    assert got == [(False, False, 1, 3), (True, True, 6, 7)]


@pytest.mark.parametrize("op", ["t23", "t24"])
def test_t23_t24_match_oracle_sf0001(spark, op):
    import duckdb
    from postgres_scanner_spark.functions.text import (
        _T23_SQL, _T24_SQL, t23_classifier_train, t24_classifier_apply)
    fn = t23_classifier_train if op == "t23" else t24_classifier_apply
    sql = _T23_SQL if op == "t23" else _T24_SQL
    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in fn(spark, sf).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_m15_plant_offset_scales_with_corpus(spark, tmp_path):
    """Plant offsets derive from max(doc_id)+1 (r11 advice), so a
    corpus living ABOVE the old fixed +100000 offset still gets
    disjoint plant ids: reals at 100000/100001 -> P = 100002, copy
    pair at (100000, 200002) with hamming 0."""
    from postgres_scanner_spark.operators import multimodal as mm
    ramp = "".join(chr(65 + (i % 26)) for i in range(100))
    noise = "".join(chr(65 + (i * 17 % 26)) for i in range(100))
    d = _write_docs(tmp_path, "sfm15big", [ramp, noise], first_id=100000)
    # plants only copy doc_id < 10, so none exist here — no pairs at
    # all unless ramp/noise collide (they don't); now add low-id docs
    rows = mm.m15_dhash_neardup(spark, str(d)).collect()
    assert rows == []
    d2 = _write_docs(tmp_path, "sfm15big2", [ramp], first_id=0)
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    t = _pq.read_table(str(d2 / "documents.parquet"))
    extra = _pa.Table.from_pylist(
        [{"doc_id": 100000, "text": noise, "lang": "en", "source": "s",
          "n_chars": len(noise)}], schema=t.schema)
    _pq.write_table(_pa.concat_tables([t, extra]),
                    str(d2 / "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in mm.m15_dhash_neardup(spark, str(d2)).collect()}
    p = 100001
    assert pairs.get((0, p)) == 0          # copy plant disjoint from reals
    assert pairs.get((0, 2 * p), 99) <= 2  # mutant plant within radius


# ---------------------------------------------------------------------
# W22 LTOB downsampling / X19 count-min heavy hitters
# ---------------------------------------------------------------------

def _write_events(tmp_path, name, rows):
    """rows: list of (event_id, ts_us, event_type, value)."""
    import datetime as dt
    tbl = pa.Table.from_pylist(
        [{"event_id": i, "ts": dt.datetime(1970, 1, 1)
          + dt.timedelta(microseconds=us),
          "user_id": i % 7, "event_type": et, "value": v,
          "props": "{}"}
         for i, us, et, v in rows],
        schema=pa.schema([
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string())]))
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return d


def _ltob_python(rows, n_buckets):
    """Pure-Python LTOB replay: full-series neighbors, equal-width
    time buckets, floor(area*1e4+.5) argmax key, endpoint rows."""
    import math
    out = []
    by_type = {}
    for i, us, et, v in rows:
        by_type.setdefault(et, []).append((us, i, v))
    for et, pts in by_type.items():
        pts.sort()
        t0, t1 = pts[0][0], max(x for x, _, _ in pts)
        span = t1 - t0 + 1
        bk = [((x - t0) * n_buckets) // span for x, _, _ in pts]
        best = {}
        for j in range(len(pts)):
            x, i, y = pts[j]
            if j == 0:
                out.append((et, bk[j], "first", x, y, -1.0))
                continue
            if j == len(pts) - 1:
                out.append((et, bk[j], "last", x, y, -1.0))
                continue
            ax, _, ay = pts[j - 1]
            cx, _, cy = pts[j + 1]
            area = abs((ax - cx) * (y - ay) - (ax - x) * (cy - ay)) / 2.0
            ak = math.floor(area * 1.0e4 + 0.5)
            key = (-ak, x, i)
            if bk[j] not in best or key < best[bk[j]][0]:
                best[bk[j]] = (key, (et, bk[j], "peak", x, y, ak / 1.0e4))
        out.extend(v for _, v in best.values())
    return sorted(out)


def test_w22_matches_python_replay(spark, tmp_path):
    """Full LTOB replay on a synthetic two-type series with spikes,
    empty buckets (bucket-edge stitching must reach across them),
    and ties."""
    from postgres_scanner_spark.functions import analytics as an
    rows = []
    eid = 0
    for et, base in (("click", 0), ("view", 3)):
        for j in range(120):
            # lumpy spacing leaves some buckets empty; spike every 17
            us = base * 1000 + j * j * 7919
            v = 100.0 if j % 17 == 0 else float(j % 5)
            rows.append((eid, us, et, v))
            eid += 1
    d = _write_events(tmp_path, "sfw22", rows)
    got = sorted(tuple(r) for r in
                 an.w22_ltob_downsample(spark, str(d)).collect())
    want = _ltob_python(rows, an._W22_BUCKETS)
    assert got == want and len(got) > 4


def test_w22_endpoints_and_single_peak(spark):
    """Real corpus invariants: exactly one 'first' and one 'last'
    per type (at the series extremes), at most one peak per
    (type, bucket), every area non-negative."""
    from postgres_scanner_spark.functions import analytics as an
    rows = an.w22_ltob_downsample(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    seen = {}
    for r in rows:
        if r.kind == "peak":
            assert r.area4 >= 0.0
            key = (r.event_type, r.bucket)
            assert key not in seen
            seen[key] = True
    for k in ("first", "last"):
        per = [r for r in rows if r.kind == k]
        assert len(per) == len({r.event_type for r in rows})


def _cms_python(texts, d, w, k):
    import hashlib
    from collections import Counter
    cnt = Counter(t for s in texts for t in s.lower().split(" ") if t)
    grid = Counter()
    for tk, c in cnt.items():
        for i in range(d):
            b = int(hashlib.md5(f"{i}:{tk}".encode())
                    .hexdigest()[:8], 16) % w
            grid[(i, b)] += c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = []
    for tk, c in top:
        est = min(grid[(i, int(hashlib.md5(f"{i}:{tk}".encode())
                               .hexdigest()[:8], 16) % w)]
                  for i in range(d))
        out.append((tk, c, est, est - c))
    return out


def test_x19_matches_python_replay(spark, tmp_path):
    """Full CMS replay: the estimate must equal the hand-computed
    min-over-rows bucket sum, including a forced collision (tiny w
    would be better, but real w with many tokens collides too)."""
    from postgres_scanner_spark.functions import analytics as an
    texts = [" ".join(f"tok{(i * j) % 97}" for j in range(50))
             for i in range(40)]
    d = _write_docs(tmp_path, "sfx19", texts)
    got = [tuple(r) for r in
           an.x19_cms_heavy_hitters(spark, str(d)).collect()]
    want = _cms_python(texts, an._X19_D, an._X19_W, an._X19_K)
    assert got == want and len(got) == an._X19_K


def test_x19_overestimate_theorem(spark):
    """CMS never underestimates — est >= exact for every reported
    token on the real corpus (the sketch only adds collisions)."""
    from postgres_scanner_spark.functions import analytics as an
    rows = an.x19_cms_heavy_hitters(spark,
                                    "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.overest >= 0 and r.cms_est >= r.exact_cnt
               for r in rows)


# ---------------------------------------------------------------------
# E24 streaming CMS maintenance
# ---------------------------------------------------------------------

def test_e24_matches_python_replay(spark, tmp_path):
    """Pure-Python replay of the WHOLE pipeline: the staged stream's
    re-delivery algebra (docs ∪ shifted copies of ids <10, 10..19,
    and two copies of the last doc — e17's stager), the merged CMS
    grid over the streamed token mass, and min-over-rows estimates
    for the PLAIN corpus's top-K tokens."""
    from postgres_scanner_spark.functions import analytics as an
    from postgres_scanner_spark.streaming import events as ev
    texts = [" ".join(f"w{(i * j) % 31}" for j in range(30))
             for i in range(24)]
    d = _write_docs(tmp_path, "sfe24", texts)
    got = [tuple(r) for r in
           ev.e24_streaming_cms_maintenance(spark, str(d)).collect()]
    # streamed corpus per the stager: ids are 0..23 so all three
    # re-delivery arms fire (ids <10, 10..19, last id twice)
    streamed = (texts + texts[:10] + texts[10:20]
                + [texts[-1], texts[-1]])
    replay = _cms_python(streamed, an._X19_D, an._X19_W, 10 ** 9)
    grid_est = {tk: est for tk, _, est, _ in replay}
    plain = _cms_python(texts, an._X19_D, an._X19_W, an._X19_K)
    want = sorted((tk, grid_est[tk]) for tk, _, _, _ in plain)
    assert got == want and len(got) == min(an._X19_K, len(want))


def test_e24_estimates_dominate_streamed_counts(spark):
    """On the real corpus: 25 probe rows, every estimate at least
    the token's PLAIN-corpus exact count (streamed mass ⊇ plain
    corpus, and CMS never underestimates)."""
    from postgres_scanner_spark.functions import analytics as an
    from postgres_scanner_spark.streaming import events as ev
    sf = "/root/testdata/sf0.001"
    got = {r.token: r.cms_est for r in
           ev.e24_streaming_cms_maintenance(spark, sf).collect()}
    exact = {r.token: r.exact_cnt for r in
             an.x19_cms_heavy_hitters(spark, sf).collect()}
    assert len(got) == an._X19_K
    assert set(got) == set(exact)
    assert all(got[t] >= exact[t] for t in got)


# ---------------------------------------------------------------------
# X20 cross-source shingle overlap matrix
# ---------------------------------------------------------------------

def _x20_python(rows, k):
    """rows: (source, text). Exact per-source distinct k-gram sets →
    full pair matrix with Jaccard (det_round 6)."""
    import itertools
    import math
    sets = {}
    for src, text in rows:
        t = text.lower().split(" ")
        sets.setdefault(src, set()).update(
            " ".join(t[i:i + k]) for i in range(len(t) - k + 1))
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        na, nb = len(sets[a]), len(sets[b])
        inter = len(sets[a] & sets[b])
        un = na + nb - inter
        j = math.floor(inter / un * 1e6 + 0.5) / 1e6
        out.append((a, b, na, nb, inter, un, j))
    return out


def test_x20_matches_python_replay(spark, tmp_path):
    """Three sources: A/B share a sentence (overlap), C is disjoint
    (zero-row must still appear in the matrix), plus within-source
    duplicate shingles (set semantics must collapse them)."""
    from postgres_scanner_spark.functions import analytics as an
    shared = "the quick brown fox jumps over the lazy dog today"
    texts = [("sa", shared + " alpha beta gamma delta epsilon"),
             ("sa", shared + " alpha beta gamma delta epsilon"),
             ("sb", shared + " zeta eta theta iota kappa"),
             ("sc", "completely different words with no overlap "
                    "whatsoever in any five gram window here")]
    d = _write_docs(tmp_path, "sfx20",
                    [t for _, t in texts],
                    sources=[s for s, _ in texts])
    got = [tuple(r) for r in
           an.x20_source_overlap_matrix(spark, str(d)).collect()]
    want = _x20_python(texts, an._X20_K)
    assert got == want
    by_pair = {(a, b): i for a, b, _, _, i, _, _ in got}
    assert by_pair[("sa", "sb")] > 0      # shared sentence found
    assert by_pair[("sa", "sc")] == 0     # disjoint pair still a row
    assert by_pair[("sb", "sc")] == 0


def test_x20_matrix_invariants(spark):
    """Real corpus: 20 sources → 190 pair rows; inter ≤ min(n_a,
    n_b); jaccard in [0, 1]; matrix covers every source pair."""
    from postgres_scanner_spark.functions import analytics as an
    rows = an.x20_source_overlap_matrix(
        spark, "/root/testdata/sf0.001").collect()
    srcs = {r.source_a for r in rows} | {r.source_b for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert r.inter <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= 1.0
        assert r.union_n == r.n_a + r.n_b - r.inter


# ---------------------------------------------------------------------
# M16 dictionary-encoding audit
# ---------------------------------------------------------------------

def test_m16_matches_rank_slice_distincts(spark, tmp_path):
    """Python replay: with rows-per-group = 64 (the floor), every
    chunk's dictionary entry count must equal the distinct count of
    that column within the row group's doc_id-rank slice, text must
    have NO dictionary, and n_values must equal the slice size —
    including the short final group."""
    from postgres_scanner_spark.operators import multimodal as mm
    langs = ["en", "de", "fr", "pt"]
    texts = [f"body {i % 7}" for i in range(200)]
    rows = [{"doc_id": i, "text": texts[i], "lang": langs[i % 4],
             "source": f"s{i % 3}", "n_chars": len(texts[i])}
            for i in range(200)]
    d = tmp_path / "sfm16"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = [tuple(r) for r in
           mm.m16_dictionary_audit(spark, str(d)).collect()]
    want = []
    for rg in range(4):                       # 64+64+64+8 rows
        lo, hi = rg * 64, min(200, (rg + 1) * 64)
        n = hi - lo
        want += [
            (rg, "doc_id", n, True, n),
            (rg, "lang", n, True, len({langs[i % 4]
                                       for i in range(lo, hi)})),
            (rg, "source", n, True, len({f"s{i % 3}"
                                         for i in range(lo, hi)})),
            (rg, "text", n, False, 0)]
    assert got == sorted(want)


def test_m16_wrong_offset_fails_loudly(spark, tmp_path):
    """read_dict_page_header must REFUSE a non-dictionary page: a
    wrong offset has to raise, never count a data page's rows as
    dictionary entries."""
    import pytest as _pytest
    from postgres_scanner_spark.parquet_bloom import (
        footer_dict_index, read_dict_page_header)
    t = pa.table({"k": list(range(100)), "s": ["a"] * 100})
    p = str(tmp_path / "probe.parquet")
    pq.write_table(t, p, row_group_size=50, use_dictionary=["k", "s"])
    idx = footer_dict_index(p)
    with open(p, "rb") as f:
        # sanity: the real dictionary offsets parse
        for rec in idx:
            assert rec["dictionary_page_offset"] is not None
            assert read_dict_page_header(
                f, rec["dictionary_page_offset"])["num_values"] > 0
        with _pytest.raises(ValueError):
            read_dict_page_header(f, idx[0]["data_page_offset"])


# ---------------------------------------------------------------------
# P15 bucketed co-located join
# ---------------------------------------------------------------------

def test_p15_join_is_exchange_free(spark):
    """The op's raison d'être: both sides read as BUCKETED scans and
    the orderkey join runs with ZERO shuffle exchanges on the join
    key — the only exchange left in the plan is the final tiny
    per-priority aggregate. If the catalog bucket spec ever stops
    reaching the planner, this pin fails before the driver sees a
    slow plan."""
    from postgres_scanner_spark.functions import scanq
    df = scanq.p15_bucketed_colocated_join(spark,
                                           "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "hashpartitioning(o_orderkey" not in plan
    assert "hashpartitioning(l_orderkey" not in plan
    rows = df.collect()
    assert len(rows) == 5 and all(r.n_items > 0 for r in rows)


# ---------------------------------------------------------------------
# T25 PMI collocations
# ---------------------------------------------------------------------

def _pmi_python(texts, min_c, k):
    import math
    from collections import Counter
    uni, big = Counter(), Counter()
    tu = dd = 0
    for s in texts:
        t = [w for w in s.lower().split(" ") if w]
        if not t:
            continue
        dd += 1
        tu += len(t)
        uni.update(t)
        big.update(zip(t, t[1:]))
    tbi = tu - dd
    rows = []
    for (w1, w2), c in big.items():
        if c < min_c:
            continue
        pmi = (math.log(c) - math.log(tbi) - math.log(uni[w1])
               - math.log(uni[w2]) + 2.0 * math.log(tu))
        ak = math.floor(pmi * 1.0e6 + 0.5)
        rows.append((-ak, w1, w2, c, uni[w1], uni[w2]))
    rows.sort()
    return [(w1, w2, c, c1, c2, -nak / 1.0e6)
            for nak, w1, w2, c, c1, c2 in rows[:k]]


def test_t25_matches_python_replay(spark, tmp_path):
    """Full PMI replay: a strongly-associated pair ('new york'
    always adjacent), a frequent-but-independent pair, and bigrams
    below the support floor that must be absent."""
    from postgres_scanner_spark.functions import text as tx
    texts = (["new york is big and the cat sat on the mat"] * 6
             + ["york new appears just once here today now"]
             + ["the dog sat on a rug in new york today"] * 5)
    d = tmp_path / "sft25"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t, "lang": "en", "source": "s",
          "n_chars": len(t)} for i, t in enumerate(texts)]),
        str(d / "documents.parquet"))
    got = [tuple(r) for r in
           tx.t25_pmi_collocations(spark, str(d)).collect()]
    want = _pmi_python(texts, tx._T25_MIN_C, tx._T25_K)
    assert got == want
    pairs = [(r[0], r[1]) for r in got]
    assert ("new", "york") in pairs
    assert ("york", "new") not in pairs       # c=1 < support floor
    # the always-adjacent pair must outrank a weakly-associated one
    # ('on the': 'on' also precedes 'a', 'the' follows many words)
    assert pairs.index(("new", "york")) < pairs.index(("on", "the"))


def test_t25_real_corpus_invariants(spark):
    """sf0.001: every row respects the support floor, c <= min
    marginal, output ranked by the rounded key then (w1, w2)."""
    from postgres_scanner_spark.functions import text as tx
    rows = [tuple(r) for r in
            tx.t25_pmi_collocations(spark,
                                    "/root/testdata/sf0.001").collect()]
    assert 0 < len(rows) <= tx._T25_K
    keys = [(-round(p * 1e6), w1, w2) for w1, w2, c, c1, c2, p in rows]
    assert keys == sorted(keys)
    for w1, w2, c, c1, c2, p in rows:
        assert c >= tx._T25_MIN_C and c <= min(c1, c2)


# ---------------------------------------------------------------------
# E25 streaming HLL distinct maintenance
# ---------------------------------------------------------------------

def _hll_python(texts, m=512, alpha=0.7213 / (1 + 1.079 / 512)):
    import hashlib
    import math
    toks = {t for s in texts for t in s.lower().split(" ") if t}
    regs = {}
    for tk in toks:
        h = int(hashlib.md5(tk.encode()).hexdigest()[:15], 16)
        j, w = h // (1 << 51), h % (1 << 51)
        rank = 52 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rank)
    m_used = len(regs)
    pow_sum = sum(1 << (52 - r) for r in regs.values())
    n = pow_sum + (m - m_used) * (1 << 52)
    raw = alpha * float(m) * float(m) * float(1 << 52) / float(n)
    v = float(m - m_used)
    est = (float(m) * math.log(float(m) / v)
           if raw <= 2.5 * m and v > 0.0 else raw)
    return (m_used, max(regs.values()), sum(regs.values()),
            sum(r * (j + 1) for j, r in regs.items()),
            math.floor(est * 1e4 + 0.5) / 1e4, len(toks))


def test_e25_matches_python_replay(spark, tmp_path):
    """Full replay: register construction, integer harmonic
    numerator, linear-counting branch (small corpora always take
    it), and the exact companion. Re-delivered stream copies must
    change nothing (max-merge idempotence) — the replay uses the
    PLAIN token set, which must equal the streamed result."""
    from postgres_scanner_spark.streaming import events as ev
    texts = [" ".join(f"tok{(i * 13 + j) % 211}" for j in range(40))
             for i in range(24)]
    d = _write_docs(tmp_path, "sfe25", texts)
    got = [tuple(r) for r in
           ev.e25_streaming_hll_distinct(spark, str(d)).collect()]
    assert got == [_hll_python(texts)]


def test_e25_accuracy_on_real_corpus(spark):
    """sf0.001: one row, m_used <= 512, and the estimate within
    3 standard errors (3 * 1.04/sqrt(512) ~ 13.8%) of the exact
    distinct — a deterministic property of this fixed corpus."""
    from postgres_scanner_spark.streaming import events as ev
    rows = ev.e25_streaming_hll_distinct(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.m_used <= 512
    assert abs(r.hll_estimate - r.exact_distinct) \
        <= 0.138 * r.exact_distinct
