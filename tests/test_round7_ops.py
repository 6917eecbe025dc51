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
