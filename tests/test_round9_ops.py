"""Behavioral pins for the round-9 additions.

D20's distinguishing properties vs the existing dedup surface:
GLOBAL marking (the original is marked, not just the later copy —
no a<b pair asymmetry) and NO frequency cap (a block pasted into 20
docs surfaces in all 20; D11's df-cap would drop such a hot phrase).
The span algebra (runs of duplicated K-grams, >= MIN_SPAN filter,
interval union) is pinned against hand-computable plants.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _d20(spark):
    from postgres_scanner_spark.operators.dedup import (
        _D20_MIN_SPAN, d20_repeated_substrings)
    rows = d20_repeated_substrings(spark, SF).collect()
    return {r.doc_id: r for r in rows}, _D20_MIN_SPAN


@pytest.mark.slow
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


@pytest.mark.slow
def test_d20_hot_block_survives_no_df_cap(spark):
    """The 15-token boilerplate block appears in 20 docs — a
    document-frequency cap (D11's hot-phrase guard) would drop it;
    the global method must report every occurrence."""
    by_id, _ = _d20(spark)
    for i in range(20):
        r = by_id.get(401000 + i)
        assert r is not None, f"boilerplate doc {401000 + i} unmarked"
        assert r.dup_tokens == 15 and r.n_spans == 1, r


@pytest.mark.slow
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


# ---------------- D20 differential pins on a handcrafted corpus ----
# Truth is hand-computable: every doc below uses doc_id >= 100 so the
# operator's own plant filters (doc_id < 10 / < 20) select nothing
# and the corpus is EXACTLY these rows.

def _mini_corpus_dir(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    p20 = [f"p{i}" for i in range(20)]        # cross-doc 20-gram
    q15 = [f"q{i}" for i in range(15)]        # within-doc repeat
    s14 = [f"s{i}" for i in range(14)]        # sub-threshold (14<15)
    u30 = [f"u{i}" for i in range(30)]        # overlap-merge target
    v18 = [f"v{i}" for i in range(18)]        # exact-copy pair
    docs = {
        100: ["f100a", "f100b"] + p20 + ["f100c", "f100d"],
        101: ["g101a", "g101b", "g101c"] + p20 + ["g101d"],
        102: q15 + [f"r102{c}" for c in "abcde"] + q15,
        103: ["h103a"] + s14 + ["h103b"],
        104: ["h104a"] + s14 + ["h104b"],
        105: u30,
        106: ["x106a", "x106b"] + u30[:20] + ["x106c"],
        107: ["y107a"] + u30[10:] + ["y107b", "y107c"],
        108: v18,
        109: v18,
        110: [],                              # empty text
        111: ["lonetoken111"],                # shorter than one k-gram
    }
    rows = [{"doc_id": k, "text": " ".join(v), "lang": "en",
             "source": "src0", "n_chars": len(" ".join(v))}
            for k, v in docs.items()]
    d = tmp_path / "sfmini"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return str(d)


def test_d20_handcrafted_truth(spark, tmp_path):
    from postgres_scanner_spark.operators.dedup import (
        d20_repeated_substrings)
    sf = _mini_corpus_dir(tmp_path)
    got = {r.doc_id: r for r in
           d20_repeated_substrings(spark, sf).collect()}
    # cross-doc 20-token phrase: both sides, one span each
    assert (got[100].n_spans, got[100].dup_tokens) == (1, 20)
    assert (got[101].n_spans, got[101].dup_tokens) == (1, 20)
    assert got[101].dup_frac == round(20 / 24, 4)
    # WITHIN-doc repetition — the ExactSubstr property no pairwise
    # dedup (D1-D19) can see: both occurrences of the 15-token block
    # in doc 102 are marked as separate spans
    assert (got[102].n_spans, got[102].dup_tokens) == (2, 30)
    assert got[102].dup_frac == round(30 / 35, 4)
    # 14-token shared phrase is BELOW MIN_SPAN: excluded entirely
    assert 103 not in got and 104 not in got
    # overlapping coverage (0-19 via doc 106, 10-29 via doc 107)
    # merges to ONE maximal span over the whole of doc 105
    assert (got[105].n_spans, got[105].dup_tokens,
            got[105].dup_frac) == (1, 30, 1.0)
    assert (got[106].n_spans, got[106].dup_tokens) == (1, 20)
    assert (got[107].n_spans, got[107].dup_tokens) == (1, 20)
    # exact-copy pair saturates: dup_frac exactly 1.0 on both
    assert got[108].dup_frac == 1.0 and got[109].dup_frac == 1.0
    assert got[108].dup_tokens == 18 and got[108].n_spans == 1
    # nothing else surfaced — in particular the empty doc (110) and
    # the doc shorter than one k-gram (111) pass through untouched
    assert set(got) == {100, 101, 102, 105, 106, 107, 108, 109}


@pytest.mark.slow
def test_d21_excises_the_d20_spans(spark, tmp_path):
    """D21 on the same handcrafted corpus: cleaned_text is the doc
    minus exactly the D20 merged intervals, and the count algebra
    ties out against the D20 report row-for-row."""
    from postgres_scanner_spark.operators.dedup import (
        d20_repeated_substrings, d21_repeated_substring_excision)
    sf = _mini_corpus_dir(tmp_path)
    rep = {r.doc_id: r for r in
           d20_repeated_substrings(spark, sf).collect()}
    exc = {r.doc_id: r for r in
           d21_repeated_substring_excision(spark, sf).collect()}
    # every corpus doc appears in the excision artifact
    assert set(exc) == set(range(100, 112))
    for doc_id, r in exc.items():
        d20r = rep.get(doc_id)
        removed = d20r.dup_tokens if d20r else 0
        assert r.n_removed == removed, (doc_id, r)
        if r.cleaned_text:
            assert r.n_kept == len(r.cleaned_text.split(" ")), r
    # empty-text doc: split('') is [''], one (empty) token — kept,
    # nothing removed, reassembles to '' (both engines agree)
    assert (exc[110].n_kept, exc[110].n_removed,
            exc[110].cleaned_text) == (1, 0, "")
    # hand-checked texts: doc 101 loses exactly the p-phrase
    assert exc[101].cleaned_text == "g101a g101b g101c g101d"
    # doc 102 loses BOTH occurrences of the within-doc block
    assert exc[102].cleaned_text == "r102a r102b r102c r102d r102e"
    # fully-duplicated docs reassemble to the empty string
    assert exc[105].cleaned_text == "" and exc[105].n_kept == 0
    assert exc[108].cleaned_text == "" and exc[109].cleaned_text == ""
    # untouched docs pass through byte-identical (lowercased corpus)
    assert exc[103].cleaned_text == "h103a " + " ".join(
        f"s{i}" for i in range(14)) + " h103b"
    # degenerate docs survive excision untouched
    assert exc[111].cleaned_text == "lonetoken111"


# ---------------- X17 DSIR truth pins on a handcrafted corpus ------
def _dsir_corpus_dir(tmp_path):
    """Target sources (src0-src3) speak vocabulary A; the raw pool
    (src9) holds docs that are pure-A (target-like), pure-B (junk),
    and mixed — so the importance ordering is hand-predictable:
    likeA > mixed > likeB."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    va = "alpha beta gamma delta epsilon zeta eta theta"
    vb = "zork quux blarg wibble frotz gnusto rezrov plugh"
    rows = []
    for i in range(8):           # target sample, vocab A
        rows.append({"doc_id": 100 + i, "text": va, "lang": "en",
                     "source": f"src{i % 4}", "n_chars": len(va)})
    picks = {200: va, 201: va,                          # likeA
             210: va.split(" ", 4)[4] + " " + vb,       # mixed
             220: vb, 221: vb}                          # likeB
    for did, txt in picks.items():
        rows.append({"doc_id": did, "text": txt, "lang": "en",
                     "source": "src9", "n_chars": len(txt)})
    d = tmp_path / "sfdsir"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return str(d)


def test_x17_importance_ordering(spark, tmp_path):
    """Raw docs made of the target vocabulary must outscore raw docs
    made of never-seen-in-target vocabulary, with the mixed doc in
    between — the defining property of the importance weight."""
    from postgres_scanner_spark.functions.analytics import (
        x17_dsir_select)
    sf = _dsir_corpus_dir(tmp_path)
    rows = x17_dsir_select(spark, sf).collect()
    got = {r.doc_id: r for r in rows}
    # only the raw pool is scored — no target doc may appear
    assert set(got) == {200, 201, 210, 220, 221}
    score = {k: v.score for k, v in got.items()}
    assert score[200] == score[201]          # identical docs tie
    assert score[200] > score[210] > score[220]
    assert score[220] == score[221]
    # ranks are 1..n in score order with doc_id tiebreak
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.doc_id for r in by_rank] == [200, 201, 210, 220, 221]
    assert [r.rank for r in by_rank] == [1, 2, 3, 4, 5]


def test_x17_target_prior_shifts_scores(spark, tmp_path):
    """The normalizer term must react to the target/raw totals: a
    pure-A raw doc's importance is POSITIVE (its grams are denser in
    the target model) and a pure-B doc's is NEGATIVE."""
    from postgres_scanner_spark.functions.analytics import (
        x17_dsir_select)
    sf = _dsir_corpus_dir(tmp_path)
    got = {r.doc_id: r for r in x17_dsir_select(spark, sf).collect()}
    assert got[200].score > 0 > got[220].score


# ---------------- T20 Kneser-Ney truth pins -------------------------
def _kn_corpus_dir(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [{"doc_id": k, "text": t, "lang": "en",
             "source": "src0", "n_chars": len(t)}
            for k, t in docs.items()]
    d = tmp_path / "sfkn"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return str(d)


def _kn_expected(docs, d=0.75):
    """Independent pure-Python KN reimplementation (the formula from
    Chen & Goodman 1999, composed in the same IEEE order)."""
    import math
    from collections import Counter, defaultdict
    bg_by_doc = {}
    c2, c1 = Counter(), Counter()
    succ, pred = defaultdict(set), defaultdict(set)
    for k, t in docs.items():
        ws = t.lower().split(" ")
        bgs = list(zip(ws, ws[1:]))
        if bgs:
            bg_by_doc[k] = bgs
        for a, b in bgs:
            c2[(a, b)] += 1
            c1[a] += 1
            succ[a].add(b)
            pred[b].add(a)
    nbt = len(c2)
    out = {}
    for k, bgs in bg_by_doc.items():
        s = 0.0
        for a, b in bgs:
            p = (((c2[(a, b)] - d) / c1[a])
                 + ((d * len(succ[a])) / c1[a]) * (len(pred[b]) / nbt))
            s += math.log(p)
        out[k] = (len(bgs),
                  math.floor(s / len(bgs) * 1e6 + 0.5) / 1e6)
    return out


def test_t20_handcrafted_truth(spark, tmp_path):
    """Hand-computed KN on a 4-bigram corpus. c2/c1/N1+ statistics
    are small enough to verify on paper: P(b|a)=13/24, P(a|b)=5/8,
    P(c|a)=5/24, P(a|c)=5/8."""
    import math
    from postgres_scanner_spark.functions.text import (
        t20_kneser_ney_logprob)
    docs = {200: "a b a c", 201: "a b", 202: "c a"}
    sf = _kn_corpus_dir(tmp_path, docs)
    got = {r.doc_id: r for r in
           t20_kneser_ney_logprob(spark, sf).collect()}
    assert set(got) == {200, 201, 202}
    exp = _kn_expected(docs)
    for k in got:
        assert (got[k].n_bigrams, got[k].kn_avg_logp) == exp[k], k
    # paper anchors (independent of the reimplementation)
    assert got[201].kn_avg_logp == \
        math.floor(math.log(13 / 24) * 1e6 + 0.5) / 1e6
    assert got[202].kn_avg_logp == \
        math.floor(math.log(5 / 8) * 1e6 + 0.5) / 1e6


def test_t20_continuation_mass_beats_mle(spark, tmp_path):
    """The property that distinguishes KN from T9's MLE: two bigrams
    with IDENTICAL c2/c1 (both 1/1 — MLE scores them equally at
    logp 0) diverge under KN because 'y' continues many distinct
    contexts while 'z' continues one."""
    from postgres_scanner_spark.functions.text import (
        t20_kneser_ney_logprob)
    docs = {300: "x y", 301: "x2 z",
            302: "p1 y", 303: "p2 y", 304: "p3 y"}
    sf = _kn_corpus_dir(tmp_path, docs)
    got = {r.doc_id: r.kn_avg_logp for r in
           t20_kneser_ney_logprob(spark, sf).collect()}
    assert got[300] > got[301]
    exp = _kn_expected(docs)
    assert {k: (1, v) for k, (n, v) in exp.items()} == \
        {k: (1, got[k]) for k in got}


def test_t20_degenerate_docs_absent(spark, tmp_path):
    """Zero-bigram docs (empty text, single token) start no bigram
    and are absent from the scored output — T9's contract."""
    from postgres_scanner_spark.functions.text import (
        t20_kneser_ney_logprob)
    docs = {400: "solo", 401: "", 402: "a b"}
    sf = _kn_corpus_dir(tmp_path, docs)
    got = {r.doc_id for r in
           t20_kneser_ney_logprob(spark, sf).collect()}
    # "" splits to [''] (one empty token) and 'solo' is one token:
    # neither forms a bigram
    assert got == {402}


# ---------------- M13 / parquet_bloom pins --------------------------
def test_xxh64_public_vectors():
    """Pins the hash to the published XXH64 vectors (seed 0) — the
    empty, short (<32B, tail-mix path) and long (>=32B, 4-lane +
    merge path) cases."""
    from postgres_scanner_spark.parquet_bloom import xxh64
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"The quick brown fox jumps over the lazy dog") \
        == 0x0B242D361FDA71BC


def test_footer_index_matches_pyarrow_metadata():
    """The spec-built thrift walk must agree with pyarrow's footer
    view on row-group/column structure; driver testdata has no
    blooms, so every offset is None."""
    import pyarrow.parquet as pq
    from postgres_scanner_spark.parquet_bloom import footer_bloom_index
    path = "/root/testdata/sf0.001/documents.parquet"
    idx = footer_bloom_index(path)
    md = pq.ParquetFile(path).metadata
    assert len(idx) == md.num_row_groups * md.num_columns
    cols = [md.schema.column(i).path for i in range(md.num_columns)]
    assert [e["column"] for e in idx[:md.num_columns]] == cols
    assert all(e["bloom_offset"] is None for e in idx)


def _bloom_staged_file(spark, tmp_path, n=20000):
    out = str(tmp_path / "bloomed")
    (spark.range(n)
     .selectExpr("id AS doc_id", "md5(cast(id AS string)) AS fp")
     .coalesce(1).sortWithinPartitions("doc_id")
     .write.mode("overwrite")
     .option("parquet.bloom.filter.enabled#fp", "true")
     .option("parquet.bloom.filter.expected.ndv#fp", str(n))
     .option("parquet.block.size", str(128 * 1024))
     .parquet(out))
    import glob
    return glob.glob(out + "/*.parquet")[0]


def test_sbbf_no_false_negatives_and_prunes(spark, tmp_path):
    """Every present key's true row group must be a bloom candidate
    (no false negatives — the spec guarantee the pruning relies on),
    and absent keys must hit almost no groups (pruning is real, not
    vacuous: an all-ones bitset would pass the first property)."""
    import hashlib
    import pyarrow.parquet as pq
    from postgres_scanner_spark import parquet_bloom as pb
    path = _bloom_staged_file(spark, tmp_path)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 3, "staging must split row groups"
    with open(path, "rb") as fh:
        bitsets = {}
        for e in pb.footer_bloom_index(path):
            if e["column"] == "fp":
                assert e["bloom_offset"] is not None, "bloom missing"
                bitsets[e["row_group"]] = pb.read_bloom_bitset(
                    fh, e["bloom_offset"], e["bloom_length"])
    starts, acc = [], 0
    for g in range(md.num_row_groups):
        starts.append(acc)
        acc += md.row_group(g).num_rows
    for i in range(0, 20000, 997):
        fp = hashlib.md5(str(i).encode()).hexdigest().encode()
        h = pb.xxh64(fp)
        true_g = max(g for g, s in enumerate(starts) if s <= i)
        assert pb.sbbf_might_contain(bitsets[true_g], h), i
    hits = total = 0
    for i in range(20000, 21000, 7):
        fp = hashlib.md5(str(i).encode()).hexdigest().encode()
        h = pb.xxh64(fp)
        hits += sum(1 for bs in bitsets.values()
                    if pb.sbbf_might_contain(bs, h))
        total += len(bitsets)
    assert hits < total * 0.05, (hits, total)


def test_m13_duplicate_text_fp_collision_guard(spark, tmp_path):
    """Two docs with IDENTICAL text share an fp; when one is probed
    the bloom candidates contain both rows and the exact doc_id
    verify must keep only the probed one."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.operators.multimodal import (
        m13_bloom_pruned_probe)
    same = "identical text payload"
    rows = [{"doc_id": i, "text": (same if i in (0, 5) else f"doc {i}"),
             "lang": "en", "source": "s", "n_chars": 22}
            for i in range(120)]
    d = tmp_path / "sfm13"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = m13_bloom_pruned_probe(spark, str(d)).collect()
    # step = max(97, 120//32) = 97 -> probes are doc_id 0 and 97;
    # doc 5 shares doc 0's fp but must NOT appear
    import hashlib
    assert [r.doc_id for r in got] == [0, 97]
    assert got[0].fp == hashlib.md5(same.encode()).hexdigest()
    assert got[1].fp == hashlib.md5(b"doc 97").hexdigest()


def test_m13_concurrent_staging_race(spark, tmp_path):
    """The gate runs queries on concurrent child sessions: two m13
    calls racing to stage the same corpus must both succeed (atomic
    rename, loser cleans up) and agree on the result."""
    import threading
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.operators.multimodal import (
        m13_bloom_pruned_probe)
    rows = [{"doc_id": i, "text": f"racer {i}", "lang": "en",
             "source": "s", "n_chars": 9} for i in range(200)]
    d = tmp_path / "sfrace"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    results, errors = {}, []

    def run(tag):
        try:
            sess = spark.newSession()
            got = m13_bloom_pruned_probe(sess, str(d)).collect()
            results[tag] = [(r.doc_id, r.fp) for r in got]
        except Exception as e:   # noqa: BLE001 - surfaced below
            errors.append((tag, e))

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert results[0] == results[1]
    assert [i for i, _ in results[0]] == [0, 97, 194]


# ---------------- A13 norm-bound MIPS pins --------------------------
def _emb_corpus_dir(tmp_path, n=300, dim=64, seed=7):
    """Deterministic synthetic embeddings modeling a REAL corpus's
    anisotropy: a shared dominant direction (learned embedding
    spaces concentrate) plus noise, with a wide norm spread — the
    regime where Cauchy-Schwarz norm-pruning earns its keep."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.RandomState(seed)
    mu = rng.randn(dim)
    mu /= np.linalg.norm(mu)
    dirs = 0.8 * mu[None, :] + 0.6 * rng.randn(n, dim) / np.sqrt(dim)
    scale = (0.1 + 3.0 * rng.rand(n))
    vecs = (dirs * scale[:, None]).astype(np.float32)
    t = pa.Table.from_pylist([
        {"vec_id": i, "embedding": vecs[i].tolist(), "label": i % 3}
        for i in range(n)])
    d = tmp_path / "sfa13"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d), vecs


def test_a13_exact_vs_brute_force(spark, tmp_path):
    """The pruned search must return EXACTLY the brute-force MIPS
    top-k (the bound is sound for any seed), on a corpus where
    pruning actually fires."""
    import numpy as np
    from postgres_scanner_spark.operators.ann import (
        N_QUERIES, TOP_K, a13_norm_bound_mips)
    sf, vecs = _emb_corpus_dir(tmp_path)
    got = a13_norm_bound_mips(spark, sf).collect()
    v = vecs.astype(np.float64)
    for qid in range(N_QUERIES):
        dots = v[N_QUERIES:] @ v[qid]
        ids = np.arange(N_QUERIES, len(v))
        order = sorted(zip(dots, ids), key=lambda p: (-p[0], p[1]))
        exp = [int(i) for _, i in order[:TOP_K]]
        rows = [r for r in got if r.query_id == qid]
        assert [r.neighbor_id for r in rows] == exp, qid
        # numpy's fused dot differs from the engines' strict fold in
        # the last ulp; 1e-4 slack on a 1e-5-rounded value only guards
        # gross mismatches — exact cross-engine equality is the gate's job
        for r, (dv, _i) in zip(rows, order[:TOP_K]):
            assert abs(r.dot - dv) < 1e-4


def test_a13_pruning_is_real(spark, tmp_path):
    """n_scanned must be well under the corpus size (an all-ones
    threshold would still be exact but prune nothing — the m12
    'selected' discipline: the mechanism is graded too)."""
    from postgres_scanner_spark.operators.ann import (
        N_QUERIES, a13_norm_bound_mips)
    sf, vecs = _emb_corpus_dir(tmp_path)
    got = a13_norm_bound_mips(spark, sf).collect()
    corpus = len(vecs) - N_QUERIES
    assert got, "top-k must be non-empty"
    for r in got:
        assert r.n_scanned <= corpus
    assert min(r.n_scanned for r in got) < corpus * 0.8, \
        [(r.query_id, r.n_scanned) for r in got]


# ---------------- W21 time-decay attribution pins -------------------
def _events_dir(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "sfw21"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "events.parquet"))
    return str(d)


def test_w21_handcrafted_credits(spark, tmp_path):
    """One purchase (value 100) with views 5/20/50 minutes before:
    half-life steps give weights 1, 1/2, 1/8 (sum 13/8), so credits
    are 800/13, 400/13, 100/13 — hand-computable dyadic shares."""
    from datetime import datetime, timezone
    from postgres_scanner_spark.functions.analytics import (
        w21_time_decay_attribution)

    def ts(minute, second=0):
        return datetime(2024, 1, 1, 12, minute, second,
                        tzinfo=timezone.utc)

    rows = [
        {"event_id": 1, "ts": ts(55), "user_id": 7,
         "event_type": "view", "value": None, "props": ""},
        {"event_id": 2, "ts": ts(40), "user_id": 7,
         "event_type": "view", "value": None, "props": ""},
        {"event_id": 3, "ts": ts(10), "user_id": 7,
         "event_type": "view", "value": None, "props": ""},
        {"event_id": 4, "ts": datetime(2024, 1, 1, 13, 0,
                                       tzinfo=timezone.utc),
         "user_id": 7, "event_type": "purchase", "value": 100.0,
         "props": ""},
        # different user: same timestamps, must not cross-credit
        {"event_id": 5, "ts": ts(55), "user_id": 8,
         "event_type": "view", "value": None, "props": ""},
    ]
    sf = _events_dir(tmp_path, rows)
    got = {r.view_id: r for r in
           w21_time_decay_attribution(spark, sf).collect()}
    assert set(got) == {1, 2, 3}
    import math

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    sw = 1.0 + 0.5 + 0.125
    assert got[1].total_credit == dr(100.0 * (1.0 / sw))
    assert got[2].total_credit == dr(100.0 * (0.5 / sw))
    assert got[3].total_credit == dr(100.0 * (0.125 / sw))
    assert all(r.n_purchases == 1 for r in got.values())


def test_w21_shared_view_accumulates(spark, tmp_path):
    """A view inside two purchases' windows earns credit from BOTH,
    summed in purchase_id order; views outside the hour (or after
    the purchase) earn nothing."""
    from datetime import datetime, timezone
    from postgres_scanner_spark.functions.analytics import (
        w21_time_decay_attribution)
    base = datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc)

    def at(minutes):
        return datetime(2024, 1, 1, 12 + minutes // 60,
                        minutes % 60, tzinfo=timezone.utc)

    rows = [
        {"event_id": 10, "ts": base, "user_id": 1,
         "event_type": "view", "value": None, "props": ""},
        # purchase A 10 min later (k=0 -> w=1, sole touch)
        {"event_id": 11, "ts": at(10), "user_id": 1,
         "event_type": "purchase", "value": 40.0, "props": ""},
        # purchase B 40 min later (k=2 -> w=.25, sole touch)
        {"event_id": 12, "ts": at(40), "user_id": 1,
         "event_type": "purchase", "value": 8.0, "props": ""},
        # view AFTER both purchases: no credit
        {"event_id": 13, "ts": at(50), "user_id": 1,
         "event_type": "view", "value": None, "props": ""},
        # view 2h before: outside every window
        {"event_id": 14, "ts": datetime(2024, 1, 1, 10, 0,
                                        tzinfo=timezone.utc),
         "user_id": 1, "event_type": "view", "value": None,
         "props": ""},
    ]
    sf = _events_dir(tmp_path, rows)
    got = {r.view_id: r for r in
           w21_time_decay_attribution(spark, sf).collect()}
    # sole-touch shares are 1.0 regardless of weight: full value
    assert set(got) == {10}
    assert got[10].n_purchases == 2
    assert got[10].total_credit == 48.0


# ---------------- M14 page-index pins --------------------------------
def test_m14_page_layout_and_zone_maps(spark, tmp_path):
    """The staged layout's OffsetIndex must show EXACT page_rows rows
    per page (including the first — parquet-mr's default row-check
    interval overshoots it) and the ColumnIndex zone maps must equal
    the data: a contiguous sorted corpus gives page p the key span
    [p*rows, p*rows + n_p - 1]."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark import parquet_bloom as pb
    from postgres_scanner_spark.operators.multimodal import (
        _M14_PAGE_ROWS, m14_page_pruned_scan)
    n = 330     # deliberately not a multiple of 64
    rows = [{"doc_id": i, "text": f"d{i}", "lang": "en",
             "source": "s", "n_chars": 3} for i in range(n)]
    d = tmp_path / "sfm14"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = m14_page_pruned_scan(spark, str(d)).collect()
    pr = _M14_PAGE_ROWS
    exp_pages = (n + pr - 1) // pr
    assert len(got) == exp_pages
    for p, r in enumerate(sorted(got, key=lambda r: r.page_id)):
        n_p = min(pr, n - p * pr)
        assert (r.page_id, r.first_row, r.n_rows) == (p, p * pr, n_p)
        assert (r.key_min, r.key_max) == (p * pr, p * pr + n_p - 1)
    # pruning is real: the [mx//8, mx//4] probe selects a strict
    # subset, and unselected pages report zero matched rows
    assert 0 < sum(r.selected for r in got) < exp_pages
    assert all(r.n_matched == 0 for r in got if not r.selected)
    # selected pages' aggregates equal the range arithmetic
    mx = n - 1
    lo, hi = mx // 8, mx // 4
    for r in got:
        if r.selected:
            ids = [i for i in range(r.key_min, r.key_max + 1)
                   if lo <= i <= hi]
            assert r.n_matched == len(ids) and r.key_sum == sum(ids)


# ---------------- D22 prefix-filter join pins ------------------------
def _d22_brute(docs, k=3, t=0.5):
    """Independent exact Jaccard over distinct word-k-gram sets."""
    grams = {}
    for i, text in docs.items():
        ws = text.lower().split(" ")
        grams[i] = {" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)} \
            if len(ws) >= k else set()
    out = {}
    ids = sorted(docs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            ni = len(grams[a] & grams[b])
            if not ni:
                continue
            na, nb = len(grams[a]), len(grams[b])
            j = ni / (na + nb - ni)
            if j >= t:
                out[(a, b)] = (ni, na, nb, j)
    return out


def _d22_corpus(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [{"doc_id": i, "text": s, "lang": "en", "source": "s",
             "n_chars": len(s)} for i, s in docs.items()]
    d = tmp_path / "sfd22"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return str(d)


def test_d22_matches_brute_force(spark, tmp_path):
    """Prefix filtering is COMPLETE (a theorem, but pin it anyway):
    the operator's pairs equal an independent exhaustive Jaccard on
    a corpus with near-dups, partial overlaps, and disjoint docs."""
    from postgres_scanner_spark.operators.dedup import (
        d22_prefix_filter_join)
    block = " ".join(f"b{i}" for i in range(10))
    docs = {100 + i: f"{block} f{i}a f{i}b" for i in range(8)}
    docs[200] = block + " ua"
    docs[201] = block + " ub"
    docs[300] = "x0 x1 x2 x3 x4 x5"                 # disjoint
    docs[301] = "x0 x1 x2 x3 y4 y5"                 # partial overlap
    sf = _d22_corpus(tmp_path, docs)
    got = {(r.doc_a, r.doc_b): (r.ni, r.na, r.nb, r.jaccard)
           for r in d22_prefix_filter_join(spark, sf).collect()}
    assert got == _d22_brute(docs)
    assert (200, 201) in got          # the high-overlap pair
    assert (300, 301) not in got      # below threshold


@pytest.mark.slow
def test_d22_exact_where_d4_cap_distorts(spark, tmp_path):
    """The differential vs D4: a pair whose similarity rides
    CORPUS-FREQUENT shingles (df above D4's cap) is reported by D22
    with its exact Jaccard, while D4's capped universe drops those
    shingles and misses the pair entirely."""
    from postgres_scanner_spark.operators.dedup import (
        d4_ngram_jaccard, d22_prefix_filter_join)
    block = " ".join(f"b{i}" for i in range(10))
    docs = {100 + i: f"{block} f{i}a f{i}b" for i in range(8)}
    docs[200] = block + " ua"
    docs[201] = block + " ub"
    sf = _d22_corpus(tmp_path, docs)
    d22 = {(r.doc_a, r.doc_b): r.jaccard
           for r in d22_prefix_filter_join(spark, sf).collect()}
    exp = _d22_brute(docs)[(200, 201)][3]
    assert d22[(200, 201)] == exp and exp >= 0.5
    # the block's 2-grams appear in 10 of 10 docs — above
    # _D4_MAX_DF_FRAC — so D4's capped index cannot see this pair
    d4 = {(r.doc_a, r.doc_b) for r in
          d4_ngram_jaccard(spark, sf).collect()}
    assert (200, 201) not in d4


def test_d22_prefix_prunes_candidates(tmp_path):
    """The prefix index is strictly smaller than the full inverted
    index and still covers every true pair — replicated in pure
    Python with the operator's (df, shingle) global order."""
    import math
    block = " ".join(f"b{i}" for i in range(10))
    docs = {100 + i: f"{block} f{i}a f{i}b" for i in range(8)}
    docs[200] = block + " ua"
    docs[201] = block + " ub"
    # dissimilar docs sharing ONLY a frequent trigram: J far below t,
    # and the shared gram's high df keeps it OUT of every prefix —
    # these pairs are what the filter prunes without verification
    for i in range(6):
        docs[400 + i] = "c0 c1 c2 " + " ".join(
            f"u{i}x{j}" for j in range(10))
    grams = {}
    for i, text in docs.items():
        ws = text.lower().split(" ")
        grams[i] = {" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)}
    df = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    t = 0.5
    prefix = {}
    for i, gs in grams.items():
        plen = len(gs) - math.ceil(t * len(gs)) + 1
        prefix[i] = set(sorted(gs, key=lambda g: (df[g], g))[:plen])
    ids = sorted(docs)
    full = {(a, b) for ai, a in enumerate(ids) for b in ids[ai + 1:]
            if grams[a] & grams[b]}
    cand = {(a, b) for ai, a in enumerate(ids) for b in ids[ai + 1:]
            if prefix[a] & prefix[b]}
    true_pairs = set(_d22_brute(docs))
    assert true_pairs <= cand <= full
    assert len(cand) < len(full)


# ---------------- X18 A-Res weighted sampling pins -------------------
def test_x18_matches_independent_ares(spark, tmp_path):
    """Pure-Python A-Res replica (same md5-derived u, same ln(u)/w
    key, same rounding/tiebreak) must reproduce the sample exactly,
    ranks included."""
    import hashlib
    import math
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.functions.analytics import (
        _X18_K, x18_weighted_reservoir_sample)
    docs = {}
    # weight spread: diversity from 1/20 (one word repeated) to 1.0
    for i in range(200):
        n_uniq = 1 + (i % 20)
        words = [f"w{i}_{j}" for j in range(n_uniq)] \
            + ["filler"] * (20 - n_uniq)
        docs[1000 + i] = " ".join(words)
    rows = [{"doc_id": k, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)} for k, t in docs.items()]
    d = tmp_path / "sfx18"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    exp = []
    for k, t in docs.items():
        ws = t.lower().split(" ")
        w = len(set(ws)) / len(ws) + 0.0625
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        exp.append((dr(math.log(u) / w), k, dr(w)))
    exp.sort(key=lambda e: (-e[0], e[1]))
    exp = exp[:_X18_K]
    got = x18_weighted_reservoir_sample(spark, str(d)).collect()
    assert len(got) == _X18_K
    assert [(r.lnkey, r.doc_id, r.weight) for r in got] \
        == [(lk, k, w) for lk, k, w in exp]
    assert [r.rank for r in got] == list(range(1, _X18_K + 1))


def test_x18_weight_monotonicity():
    """The A-Res key is monotone in w for fixed u: heavier docs get
    larger ln(u)/w (closer to 0), so at equal hash luck the heavier
    doc always wins — the property that makes the sample weighted."""
    import math
    u = 0.3
    keys = [math.log(u) / (w + 0.0625) for w in (0.1, 0.5, 1.0)]
    assert keys[0] < keys[1] < keys[2]
