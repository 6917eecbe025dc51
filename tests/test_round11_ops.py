"""Round-11 operator truth pins: T22 unigram-LM encode (the apply
half of T21's trainer) and the d24 convergence guard."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, name, texts):
    rows = [{"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)} for i, t in enumerate(texts)]
    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    return d


@pytest.mark.slow
def test_t22_hand_truth(spark, tmp_path):
    """Same corpus as T21's hand pin (3 docs of "abab cd"): the
    trained model keeps abab/cd at ln(3/10) and chars at ln(1/10).
    Encoding: "abab" -> [abab] (one ln(3/10) piece beats any split
    using ln(1/10) chars), "cd" -> [cd]. Per doc: 2 words, 6 chars,
    2 tokens, compression 3.0."""
    from postgres_scanner_spark.functions.text import (
        t22_unigram_lm_encode)
    d = _write_docs(tmp_path, "sft22", ["abab cd"] * 3)
    got = [(r.doc_id, r.n_words, r.n_base_chars, r.n_tokens,
            r.compression)
           for r in t22_unigram_lm_encode(spark, str(d)).collect()]
    assert got == [(i, 2, 6, 2, 3.0) for i in range(3)]


@pytest.mark.slow
def test_t22_long_word_char_fallback(spark, tmp_path):
    """Words longer than _T21_MAX_WLEN never reach the trainer, so
    the encoder must char-fallback them: "abcdefghij" (10 chars)
    costs 10 tokens while "abab" costs 1 -> 2 words, 14 chars,
    11 tokens, compression floor(14/11*1e5+0.5)/1e5 = 1.27273."""
    from postgres_scanner_spark.functions.text import (
        _T21_MAX_WLEN, t22_unigram_lm_encode)
    assert len("abcdefghij") > _T21_MAX_WLEN
    d = _write_docs(tmp_path, "sft22b", ["abab abcdefghij"])
    got = [(r.doc_id, r.n_words, r.n_base_chars, r.n_tokens,
            r.compression)
           for r in t22_unigram_lm_encode(spark, str(d)).collect()]
    assert got == [(0, 2, 14, 11, 1.27273)]


@pytest.mark.slow
def test_t22_matches_oracle_tiny(spark, tmp_path):
    """Oracle end-to-end on the tie-break corpus (exact-score DP
    ties resolved by smallest seg string in both engines)."""
    from postgres_scanner_spark.functions.text import (
        _T22_SQL, t22_unigram_lm_encode)
    d = _write_docs(
        tmp_path, "sft22c",
        ["xy yz xyz", "xy yz xyz", "xy xy yz yz x z",
         "supercalifragilistic xyz xy"])
    got = [tuple(r)
           for r in t22_unigram_lm_encode(spark, str(d)).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = [tuple(r) for r in con.execute(_T22_SQL).fetchall()]
    assert got == want


def test_d24_nonconvergence_raises(spark, monkeypatch):
    """The round cap must not silently return unconverged labels:
    with the cap forced to 0 rounds, a path graph is NOT stable
    (one more LS/SS round rewrites its edges), so _d24_labels must
    raise instead of labeling."""
    from postgres_scanner_spark.operators import dedup
    monkeypatch.setattr(dedup, "_D24_MAX_ROUNDS", 0)
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup._d24_labels(nodes, edges).collect()


@pytest.mark.slow
def test_d24_cap_path_accepts_converged(spark, monkeypatch):
    """Conversely, if the cap trips but the edge set IS stable (a
    single star is a fixed point after one round), the verification
    pass must accept and label correctly."""
    from postgres_scanner_spark.operators import dedup
    monkeypatch.setattr(dedup, "_D24_MAX_ROUNDS", 1)
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 5)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, k) for k in range(2, 5)], "src long, dst long")
    got = {r.doc_id: r.lbl for r in
           dedup._d24_labels(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


# ---------------------------------------------------------------------
# D25: chunk-grain fuzzy-dedup clustering
# ---------------------------------------------------------------------

def _block(tag, n=60):
    return " ".join(f"{tag}{i}" for i in range(n))


def _write_d25_docs(tmp_path, name, texts):
    return _write_docs(tmp_path, name, texts)


@pytest.mark.slow
def test_d25_transitive_chain(spark, tmp_path):
    """A=X+Y, B=Y+Z, C=Z+W with disjoint 60-word blocks: A~B share
    Y's interior chunks, B~C share Z's — A and C share NOTHING, yet
    the chunk-grain transitive closure must put all three in one
    cluster (the case pairwise dedup can't close over). D=V is
    unrelated. Plants add exact copies at +100000, which share ALL
    chunks with their originals, so the expected clusters are
    {0,1,2}+copies and {3, 100003}."""
    from postgres_scanner_spark.operators.dedup import d25_chunk_cluster
    X, Y, Z, W, V = (_block(t) for t in ("xa", "yb", "zc", "wd", "ve"))
    d = _write_d25_docs(tmp_path, "sfd25a",
                        [f"{X} {Y}", f"{Y} {Z}", f"{Z} {W}", V])
    got = [(r.cluster_id, r.n_members, r.member_max)
           for r in d25_chunk_cluster(spark, str(d)).collect()]
    assert got == [(0, 6, 100002), (3, 2, 100003)]


@pytest.mark.slow
def test_d25_df_cap_drops_boilerplate(spark, tmp_path):
    """A boilerplate block shared by 20 docs (+ their 20 plant
    copies = DF 40 > _D25_MAX_DF) must NOT create cross-doc edges;
    each doc still clusters with its exact plant copy through its
    unique tail. Expect exactly 20 clusters of exactly 2 members."""
    from postgres_scanner_spark.operators.dedup import d25_chunk_cluster
    boiler = _block("bp")
    d = _write_d25_docs(
        tmp_path, "sfd25b",
        [f"{boiler} {_block(f'u{i}x')}" for i in range(20)])
    rows = d25_chunk_cluster(spark, str(d)).collect()
    assert len(rows) == 20
    assert all(r.n_members == 2 for r in rows)
    assert sorted(r.cluster_id for r in rows) == list(range(20))


@pytest.mark.slow
def test_d25_matches_oracle_synthetic(spark, tmp_path):
    """Differential vs the recursive-CTE oracle on the chain corpus
    plus a partial-overlap doc (first half of Y only)."""
    from postgres_scanner_spark.operators.dedup import (
        _D25_SQL, d25_chunk_cluster)
    X, Y, Z = (_block(t) for t in ("xa", "yb", "zc"))
    half_y = " ".join(Y.split()[:30])
    d = _write_d25_docs(tmp_path, "sfd25c",
                        [f"{X} {Y}", f"{Y} {Z}", f"{half_y} {Z}"])
    got = [tuple(r) for r in d25_chunk_cluster(spark, str(d)).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = [tuple(r) for r in con.execute(_D25_SQL).fetchall()]
    assert got == want and len(got) >= 1


# ---------------------------------------------------------------------
# D26: NearDup apply (LSH clusters -> keep/remove manifest)
# ---------------------------------------------------------------------

def test_d26_neardup_apply_hand_truth(spark, tmp_path):
    """A, A' (one word mutated: Jaccard ~0.9 >> 0.5) and unrelated B.
    Plants copy all three at +100000. Expected components:
    {A, A', copies} (4 members, 3 removed) via near-dup edges and
    {B, B_copy} (2 members, 1 removed) via the exact-copy edge ->
    per-lang report (en, 6, 2, 4)."""
    from postgres_scanner_spark.operators.dedup import d26_neardup_apply
    A = _block("na")
    A2 = A.replace("na30", "MUT")
    B = _block("nb")
    d = _write_docs(tmp_path, "sfd26", [A, A2, B])
    got = [tuple(r) for r in d26_neardup_apply(spark, str(d)).collect()]
    assert got == [("en", 6, 2, 4)]


def test_d26_matches_oracle_sf0001(spark):
    """Differential vs the embedded-d2 + reachability oracle on the
    real sf0.001 corpus."""
    import duckdb as _dd
    from postgres_scanner_spark.operators.dedup import (
        _d26_sql, d26_neardup_apply)
    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in d26_neardup_apply(spark, sf).collect()]
    con = _dd.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_d26_sql()).fetchall()]
    assert got == want and sum(r[1] for r in got) > 0


# ---------------------------------------------------------------------
# M15: perceptual near-dup payload dedup (dHash + banded Hamming)
# ---------------------------------------------------------------------

@pytest.mark.slow
def test_m15_plants_and_radius(spark):
    """Exact copies (+P) must pair with their originals at hamming 0;
    last-byte mutants (+2P) flip at most 2 difference bits and must
    land within the radius; all reported pairs honor hamming <= 3 and
    doc_a < doc_b. P = max(doc_id)+1 (r12: derived offset, so plant
    ids stay disjoint from real ids at any corpus size)."""
    from postgres_scanner_spark.operators.multimodal import (
        _M15_SAMPLES, m15_dhash_neardup)
    sf = "/root/testdata/sf0.001"
    rows = m15_dhash_neardup(spark, sf).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    p = docs.agg({"doc_id": "max"}).first()[0] + 1
    long_ids = {r.doc_id for r in
                docs.filter(f"length(text) >= {_M15_SAMPLES} "
                            "AND doc_id < 10")
                .select("doc_id").collect()}
    assert long_ids, "corpus too short for the test to mean anything"
    for i in long_ids:
        assert pairs.get((i, i + p)) == 0, f"copy pair {i}"
        assert pairs.get((i, i + 2 * p), 99) <= 2, f"mutant pair {i}"
        # copy and mutant of the same doc differ by the same <=2 bits
        assert pairs.get((i + p, i + 2 * p), 99) <= 2
    assert all(h <= 3 for h in pairs.values())
    assert all(a < b for a, b in pairs)


@pytest.mark.slow
def test_m15_matches_oracle_tiny(spark, tmp_path):
    """Differential on a synthetic corpus with a known near-pair:
    two 100-char ramps differing by one interior byte, plus an
    unrelated noise doc."""
    import duckdb as _dd
    from postgres_scanner_spark.operators.multimodal import (
        _m15_sql, m15_dhash_neardup)
    ramp = "".join(chr(65 + (i % 26)) for i in range(100))
    ramp2 = ramp[:50] + "z" + ramp[51:]
    noise = "".join(chr(65 + (i * 17 % 26)) for i in range(100))
    d = _write_docs(tmp_path, "sfm15", [ramp, ramp2, noise])
    got = [tuple(r) for r in m15_dhash_neardup(spark, str(d)).collect()]
    con = _dd.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = [tuple(r) for r in con.execute(_m15_sql()).fetchall()]
    assert got == want
    assert (0, 1) in {(a, b) for a, b, _ in got}
