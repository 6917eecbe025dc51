"""Round-10 pins: advisor-low hardening (bloom reader bounds,
multimodal staging error surface) plus truth pins for the round's new
work (added below as it lands)."""
import io

import pytest


# ---------------------------------------------------------------------
# parquet_bloom.read_bloom_bitset bounds hardening (ADVICE r9 low #1)
# ---------------------------------------------------------------------

def _compact_header(num_bytes: int) -> bytes:
    """Minimal valid compact-thrift BloomFilterHeader: field 1 (i32
    numBytes, zigzag), fields 2/3/4 as empty-union structs (wire type
    12 = struct, immediately terminated), then stop byte."""
    def zz(v):
        u = (v << 1) ^ (v >> 63)
        out = b""
        while True:
            c = u & 0x7F
            u >>= 7
            if u:
                out += bytes([c | 0x80])
            else:
                return out + bytes([c])
    h = bytes([0x15]) + zz(num_bytes)          # fid 1, type 5 (i32)
    # fids 2/3/4 (algorithm/hash/compression unions), each an empty
    # struct: field header (delta 1, type 12=struct) + stop byte
    h += bytes([0x1C, 0x00]) * 3
    h += bytes([0x00])                          # header stop
    return h


def test_bloom_header_truncated_raises_valueerror():
    """An EOF-truncated header must raise ValueError with context,
    never a bare IndexError out of the varint reader."""
    from postgres_scanner_spark.parquet_bloom import read_bloom_bitset
    # field header says "fid 1 i32" but the varint never terminates
    buf = io.BytesIO(bytes([0x15, 0x80, 0x80]))
    with pytest.raises(ValueError, match="truncated|numBytes"):
        read_bloom_bitset(buf, 0, None)


def test_bloom_declared_length_smaller_than_bitset_raises():
    """bloom_filter_length smaller than header+numBytes must fail
    loudly instead of silently reading past the declared region."""
    from postgres_scanner_spark.parquet_bloom import read_bloom_bitset
    hdr = _compact_header(64)
    payload = hdr + b"\x00" * 64
    buf = io.BytesIO(payload)
    # declared length covers the header + 10 bytes only
    with pytest.raises(ValueError, match="too small"):
        read_bloom_bitset(buf, 0, len(hdr) + 10)
    # sanity: the same header with a covering length parses fine
    buf.seek(0)
    assert read_bloom_bitset(io.BytesIO(payload), 0,
                             len(payload)) == b"\x00" * 64
    # and the offset-only path (length=None) fetches the remainder
    assert read_bloom_bitset(io.BytesIO(payload), 0, None) \
        == b"\x00" * 64


# ---------------------------------------------------------------------
# multimodal._staged_dir failure surface (ADVICE r9 low #2)
# ---------------------------------------------------------------------

def test_staged_dir_build_failure_propagates_and_cleans(tmp_path,
                                                        monkeypatch):
    import glob
    import os
    from postgres_scanner_spark.operators import multimodal as mm

    key = "r10-build-fail-pin"
    stage_glob = "/tmp/r10pin-*"
    for p in glob.glob(stage_glob):
        import shutil
        shutil.rmtree(p, ignore_errors=True)

    def bad_build(tmp):
        os.makedirs(tmp)
        raise RuntimeError("disk full simulation")

    with pytest.raises(RuntimeError, match="disk full"):
        mm._staged_dir(None, key, "r10pin-", bad_build)
    # the uuid spool must not leak
    assert glob.glob("/tmp/r10pin-*") == []


def test_staged_dir_rename_failure_without_winner_raises(tmp_path):
    """A rename failure when no concurrent winner produced the stage
    dir must surface, not return a path that does not exist."""
    import glob
    import os
    import shutil
    from postgres_scanner_spark.operators import multimodal as mm

    for p in glob.glob("/tmp/r10pin2-*"):
        shutil.rmtree(p, ignore_errors=True)

    def no_dir_build(tmp):
        pass  # writes nothing -> os.rename(tmp, stage) -> ENOENT

    with pytest.raises(OSError):
        mm._staged_dir(None, "r10-rename-fail", "r10pin2-", no_dir_build)
    assert glob.glob("/tmp/r10pin2-*") == []


def test_staged_dir_race_loser_returns_winner(tmp_path):
    """If the stage dir appears between the exists() check and the
    rename (a real race), the loser must quietly adopt the winner."""
    import glob
    import os
    import shutil
    from postgres_scanner_spark.operators import multimodal as mm

    for p in glob.glob("/tmp/r10pin3-*"):
        shutil.rmtree(p, ignore_errors=True)
    import hashlib
    key = "r10-race"
    stage = "/tmp/r10pin3-" + hashlib.md5(key.encode()).hexdigest()[:8]

    def winner_then_build(tmp):
        os.makedirs(stage)          # simulate the concurrent winner
        with open(os.path.join(stage, "w"), "w") as f:
            f.write("winner")
        os.makedirs(tmp)
        with open(os.path.join(tmp, "l"), "w") as f:
            f.write("loser")

    got = mm._staged_dir(None, key, "r10pin3-", winner_then_build)
    assert got == stage and os.path.isdir(stage)
    assert os.path.exists(os.path.join(stage, "w"))
    # loser spool cleaned
    assert [p for p in glob.glob("/tmp/r10pin3-*") if p != stage] == []
    shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------
# T21 unigram-LM trainer truth pin (hand-computed)
# ---------------------------------------------------------------------

def test_t21_unigram_lm_hand_truth(spark, tmp_path):
    """3 docs of "abab cd". Seed counts: a=6 b=6 ab=6, ba/aba/bab/
    abab/cd/c/d=3, T0=39. Round-1 Viterbi: [abab] (ln(3/39)) beats
    [ab,ab] (2*ln(6/39)) and every char split, [cd] beats [c,d] ->
    counts {abab:3, cd:3} + char floor 1 each, T=10. Rounds 2-3 are
    stationary ('ab' dropped from the vocab, chars can't compete).
    Final: ln(3/10)=-1.203973, ln(1/10)=-2.302585 after det_round6."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.functions.text import t21_unigram_lm_train
    rows = [{"doc_id": i, "text": "abab cd", "lang": "en",
             "source": "s", "n_chars": 7} for i in range(3)]
    d = tmp_path / "sft21"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = [(r.rank, r.piece, r.n_chars, r.cnt, r.logprob)
           for r in t21_unigram_lm_train(spark, str(d)).collect()]
    assert got == [
        (1, "abab", 4, 3, -1.203973),
        (2, "cd",   2, 3, -1.203973),
        (3, "a",    1, 1, -2.302585),
        (4, "b",    1, 1, -2.302585),
        (5, "c",    1, 1, -2.302585),
        (6, "d",    1, 1, -2.302585),
    ]


def test_t21_tiebreak_prefers_lexicographic_seg(spark, tmp_path):
    """Two segmentations with the same piece-count product are an
    EXACT score tie; the DP must resolve by smallest seg string in
    both engines. Also pins the oracle end-to-end on a tiny corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.functions.text import (
        t21_unigram_lm_train, _T21_SQL)
    rows = [{"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)}
            for i, t in enumerate(
                ["xy yz xyz", "xy yz xyz", "xy xy yz yz x z"])]
    d = tmp_path / "sft21b"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = [(r.rank, r.piece, r.cnt, r.logprob)
           for r in t21_unigram_lm_train(spark, str(d)).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = [(r[0], r[1], r[3], r[4])
            for r in con.execute(_T21_SQL).fetchall()]
    assert got == want


# ---------------------------------------------------------------------
# SPARK_GRAFT_HASH_GRAMS: hashed-shuffle-key path result-equality pins
# ---------------------------------------------------------------------

def test_d20_hash_grams_path_equal(spark, monkeypatch):
    """xxhash64(gram) shuffle keys must yield byte-identical spans:
    the dup-count + semi-join are hash-invariant (2^-64 collisions
    aside), so only the shuffle width changes."""
    from postgres_scanner_spark.operators.dedup import (
        d20_repeated_substrings)
    sf = "/root/testdata/sf0.01"
    monkeypatch.delenv("SPARK_GRAFT_HASH_GRAMS", raising=False)
    base = [tuple(r) for r in d20_repeated_substrings(spark, sf).collect()]
    monkeypatch.setenv("SPARK_GRAFT_HASH_GRAMS", "1")
    hashed = [tuple(r) for r in d20_repeated_substrings(spark, sf).collect()]
    assert base == hashed and len(base) > 0


@pytest.mark.slow
def test_d22_hash_grams_path_equal(spark, monkeypatch):
    """Prefix filtering is exact under ANY consistent global shingle
    order; hashing permutes the (df, s) order and therefore the
    prefix CONTENT, but the verified pair set and Jaccard values
    must not move."""
    from postgres_scanner_spark.operators.dedup import (
        d22_prefix_filter_join)
    sf = "/root/testdata/sf0.01"
    monkeypatch.delenv("SPARK_GRAFT_HASH_GRAMS", raising=False)
    base = [tuple(r) for r in d22_prefix_filter_join(spark, sf).collect()]
    monkeypatch.setenv("SPARK_GRAFT_HASH_GRAMS", "1")
    hashed = [tuple(r) for r in d22_prefix_filter_join(spark, sf).collect()]
    assert base == hashed and len(base) > 0


# ---------------------------------------------------------------------
# D23 benchmark span excision truth pin (hand-computed)
# ---------------------------------------------------------------------

def test_d23_benchmark_span_excision_hand_truth(spark, tmp_path):
    """Eval doc = e1..e20 (src0). Train docs exercise every branch
    of the piece arithmetic (PAD=10, K=13, MAX_PIECES=4):
    - doc 1: 5 fillers + e3..e17 + 5 fillers (n=25): hits at 5,6,7,
      padded spans clip to the whole doc -> n_pieces 0 -> dropped.
    - doc 2: 30 fillers + e3..e17 + 30 fillers (n=75): merged span
      [20,54], removed 35, two surviving pieces -> kept.
    - doc 3: all-filler -> no output row.
    - doc 4: five separated 13-token eval slices (gaps 22 > span
      reach) -> 5 spans, 6 pieces > 4 -> dropped whole.
    - plant 500000 (eval doc 0 < 40): zq/zr fillers + e1..e20
      (n=24), 8 hits merge to the whole doc -> dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from postgres_scanner_spark.operators.dedup import (
        d23_benchmark_span_excision)
    ev = ["e%d" % i for i in range(1, 21)]
    fc = iter(range(1000))
    f = lambda k: ["f%d" % next(fc) for _ in range(k)]
    doc4 = (f(12) + ev[0:13] + f(22) + ev[1:14] + f(22) + ev[2:15]
            + f(22) + ev[3:16] + f(22) + ev[4:17] + f(12))
    rows = [
        {"doc_id": 0, "text": " ".join(ev), "lang": "en",
         "source": "src0", "n_chars": 1},
        {"doc_id": 1, "text": " ".join(f(5) + ev[2:17] + f(5)),
         "lang": "en", "source": "src1", "n_chars": 1},
        {"doc_id": 2, "text": " ".join(f(30) + ev[2:17] + f(30)),
         "lang": "en", "source": "src1", "n_chars": 1},
        {"doc_id": 3, "text": " ".join(f(40)), "lang": "en",
         "source": "src1", "n_chars": 1},
        {"doc_id": 4, "text": " ".join(doc4), "lang": "en",
         "source": "src1", "n_chars": 1},
    ]
    d = tmp_path / "sfd23"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    got = [(r.doc_id, r.n_spans, r.removed_tokens, r.total_tokens,
            r.n_pieces, r.dropped)
           for r in d23_benchmark_span_excision(spark, str(d)).collect()]
    assert got == [
        (1,      1,  25,  25, 0, True),
        (2,      1,  35,  75, 2, False),
        (4,      5, 165, 177, 6, True),
        (500000, 1,  24,  24, 0, True),
    ]


def test_d23_hash_grams_path_equal(spark, monkeypatch):
    from postgres_scanner_spark.operators.dedup import (
        d23_benchmark_span_excision)
    sf = "/root/testdata/sf0.01"
    monkeypatch.delenv("SPARK_GRAFT_HASH_GRAMS", raising=False)
    base = [tuple(r) for r in
            d23_benchmark_span_excision(spark, sf).collect()]
    monkeypatch.setenv("SPARK_GRAFT_HASH_GRAMS", "1")
    hashed = [tuple(r) for r in
              d23_benchmark_span_excision(spark, sf).collect()]
    assert base == hashed and len(base) > 0


# ---------------------------------------------------------------------
# streaming stage symlink must absolutize a relative source (r10 bug)
# ---------------------------------------------------------------------

def test_stage_symlink_absolutizes_relative_src(tmp_path, monkeypatch):
    """A relative sf_dir (how the sf1 blanket gate was invoked) used
    to produce a /tmp symlink with a RELATIVE target -> dangling ->
    every streaming drain returned 0 rows. The stager must key and
    link on the absolute path."""
    import os
    from postgres_scanner_spark.streaming.events import _stage_symlink
    src_abs = str(tmp_path / "events.parquet")
    with open(src_abs, "w") as f:
        f.write("x")
    monkeypatch.chdir(tmp_path)
    stage = _stage_symlink("events.parquet")      # relative spelling
    link = os.path.join(stage, "events.parquet")
    assert os.path.isabs(os.readlink(link))
    assert os.path.exists(link)                   # not dangling
    # and the relative/absolute spellings share one spool
    assert _stage_symlink(src_abs) == stage


# ---------------------------------------------------------------------
# D24 large-star/small-star connected components
# ---------------------------------------------------------------------

def test_d24_chain_and_adversarial_topologies(spark):
    """The corpus graph is star-shaped (diameter ≤ 2·key types); the
    published algorithm's value is ARBITRARY topology. Drive the
    factored alternation with a 64-node path (diameter 63 — min-label
    propagation would need 63 rounds; LS/SS must finish within the
    8-round cap), two descending-id chains, and a disconnected node."""
    from pyspark.sql import functions as F
    from postgres_scanner_spark.operators.dedup import _d24_labels
    # path 0-1-2-...-63 with ids SHUFFLED so edge direction varies
    ids = [(i * 37) % 64 + 100 for i in range(64)]  # 37 coprime 64
    edges = [(ids[i], ids[i + 1]) for i in range(63)]
    # second component: descending chain 900->800->700
    edges += [(900, 800), (800, 700)]
    nodes = sorted({x for e in edges for x in e} | {50})  # 50 isolated
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.doc_id: r.lbl for r in _d24_labels(ndf, edf).collect()}
    assert got[50] == 50                       # isolated labels self
    assert all(got[i] == 100 for i in ids)     # path comp min = 100
    assert got[900] == got[800] == got[700] == 700
    assert got[700] == 700


@pytest.mark.slow
def test_d24_matches_d6_rows(spark):
    """Same spec, different machine: row-identical to D6 at sf0.01."""
    from postgres_scanner_spark.operators.dedup import (
        d6_dedup_clusters, d24_cc_two_phase)
    sf = "/root/testdata/sf0.01"
    a = [tuple(r) for r in d6_dedup_clusters(spark, sf).collect()]
    b = [tuple(r) for r in d24_cc_two_phase(spark, sf).collect()]
    assert a == b and len(a) > 0
