"""Text analysis operators over the documents table.

Training-data pipeline staples (SURVEY.md §2 T1-T4): language ID,
quality scoring, token counting, fingerprinting. Everything stays
JVM-side (built-in string/regex/array functions — no Python UDFs), so
the hot path is whole-stage-codegen'd and scales linearly with
partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .. import tables
    return tables.load(spark, sf_dir, name)


def _tokens():
    return F.split(F.lower(F.col("text")), " ")


# ---- T1: language ID (stopword-ratio n-gram heuristic)
def t1_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = _tokens()
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    ratio = stop_hits / F.size(toks)
    pred = F.when(ratio >= 0.03, "en").otherwise("other")
    return (
        d.select("doc_id", "lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


_T1_SQL = f"""
SELECT lang, pred_lang, COUNT(*) AS n FROM (
  SELECT lang,
    CASE WHEN len(list_filter(string_split(lower(text), ' '),
                  x -> x IN {repr(_EN_STOPWORDS)})) * 1.0
              / len(string_split(lower(text), ' ')) >= 0.03
         THEN 'en' ELSE 'other' END AS pred_lang
  FROM documents)
GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


# ---- T2: quality scoring (length/punct/stopword/upper ratios)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = _tokens()
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", ""))
    n_upper = F.length(F.regexp_replace(F.col("text"), "[^A-Z]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    n_toks = F.size(toks)
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (n_alpha / n_chars) * 0.3
        + (stop_hits / n_toks) * 0.2
        + (F.lit(1.0) - n_upper / n_chars) * 0.1
    )
    return (
        d.select("doc_id", F.round(score, 6).alias("quality"))
        .orderBy("doc_id")
    )


_T2_SQL = f"""
SELECT doc_id, ROUND(
    LEAST(len(string_split(lower(text),' ')) / 100.0, 1.0) * 0.4
  + (len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0 / len(text)) * 0.3
  + (len(list_filter(string_split(lower(text),' '),
         x -> x IN {repr(_EN_STOPWORDS)})) * 1.0
       / len(string_split(lower(text),' '))) * 0.2
  + (1.0 - len(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 / len(text)) * 0.1
  , 6) AS quality
FROM documents ORDER BY doc_id
"""


# ---- T3: token counting (whitespace + BPE-ish regex)
def t3_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ws = F.size(_tokens())
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0))
    return (
        d.select("doc_id", "source", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("ws_tokens").alias("total_ws_tokens"),
             F.sum("bpe_tokens").alias("total_bpe_tokens"),
             F.max("bpe_tokens").alias("max_bpe_tokens"))
        .orderBy("source")
    )


_T3_SQL = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(lower(text), '{_BPE_RE}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(MAX(len(regexp_extract_all(lower(text), '{_BPE_RE}'))) AS BIGINT) AS max_bpe_tokens
FROM documents GROUP BY source ORDER BY source
"""


# ---- T4: document fingerprinting (normalized-content hash)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    fp = F.md5(norm)
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("first_doc"), F.count("*").alias("n_docs"))
        .orderBy("fingerprint")
    )


_T4_SQL = r"""
SELECT fingerprint, MIN(doc_id) AS first_doc, COUNT(*) AS n_docs
FROM (SELECT doc_id,
             md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
      FROM documents)
GROUP BY fingerprint ORDER BY fingerprint
"""


QUERIES = {
    "t1_language_id": t1_language_id,
    "t2_quality_score": t2_quality_score,
    "t3_token_count": t3_token_count,
    "t4_fingerprint": t4_fingerprint,
}

ORACLE = {
    "t1_language_id": _T1_SQL,
    "t2_quality_score": _T2_SQL,
    "t3_token_count": _T3_SQL,
    "t4_fingerprint": _T4_SQL,
}
