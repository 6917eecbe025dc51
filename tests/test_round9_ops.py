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
