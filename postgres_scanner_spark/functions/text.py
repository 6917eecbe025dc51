"""Text analysis operators over the documents table.

Training-data pipeline staples (SURVEY.md §2 T1-T12): language ID,
quality scoring, token counting, fingerprinting, the chained filter
pipeline, PII redaction, repetition stats, character entropy, corpus
bigram-LM scoring, TF-IDF keyword extraction, BPE merge-pair
counting, and the Zipf-law vocabulary fit. Everything stays
JVM-side (built-in string/regex/array functions — no Python UDFs), so
the hot path is whole-stage-codegen'd and scales linearly with
partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import det_round, det_round_sql, scratch_persist

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .. import tables
    return tables.load(spark, sf_dir, name)


def _tokens(unicode_mode: bool = False):
    """Whitespace tokens (default — the oracle-pinned behavior of
    every pre-r7 query), or Unicode-category tokens (letters/digits
    of any script) for multilingual corpora; CJK needs character
    shingles — see operators.dedup.d19 / t18_script_id."""
    if unicode_mode:
        return F.filter(
            F.split(F.lower(F.col("text")), r"[^\p{L}\p{N}]+"),
            lambda x: x != "")
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
    # regexp_count counts class matches without materializing the
    # stripped string (t18's 2×-at-sf1 finding); oracles keep the
    # replace-based spelling — equal by definition for char classes
    n_alpha = F.regexp_count(F.col("text"), F.lit("[a-zA-Z ]"))
    n_upper = F.regexp_count(F.col("text"), F.lit("[A-Z]"))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    n_toks = F.size(toks)
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (n_alpha / n_chars) * 0.3
        + (stop_hits / n_toks) * 0.2
        + (F.lit(1.0) - n_upper / n_chars) * 0.1
    )
    # det_round, not round(): the score is a double and an exact
    # 7th-decimal tie (e.g. 0.5096875) rounds differently across
    # engines' round() — 36 sf1 rows flipped before this (round 9)
    return (
        d.select("doc_id", det_round(score, 6).alias("quality"))
        .orderBy("doc_id")
    )


_T2_SQL = f"""
SELECT doc_id, {det_round_sql('''
    LEAST(len(string_split(lower(text),' ')) / 100.0, 1.0) * 0.4
  + (len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0 / len(text)) * 0.3
  + (len(list_filter(string_split(lower(text),' '),
         x -> x IN ''' + repr(_EN_STOPWORDS) + ''')) * 1.0
       / len(string_split(lower(text),' '))) * 0.2
  + (1.0 - len(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 / len(text)) * 0.1
''', 6)} AS quality
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
             F.max("bpe_tokens").cast("long").alias("max_bpe_tokens"))
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


# ---- T5: end-to-end quality filter pipeline (the real training-data
#      shape: chain lang-ID + quality + length + exact-dup filters and
#      report per-stage attrition)
def t5_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compose T1-T4 into the canonical pre-training filter chain and
    report the funnel: how many documents survive each gate. One pass
    over the corpus, all gates as JVM columns (single codegen stage per
    doc, one tiny aggregation at the end — at 100 TB the filter chain
    is scan-bound, exactly as it should be)."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens()
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    n_chars = F.length("text")
    # regexp_count counts class matches without materializing the
    # stripped string (t18's 2×-at-sf1 finding); oracles keep the
    # replace-based spelling — equal by definition for char classes
    n_alpha = F.regexp_count(F.col("text"), F.lit("[a-zA-Z ]"))
    n_upper = F.regexp_count(F.col("text"), F.lit("[A-Z]"))
    quality = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (n_alpha / n_chars) * 0.3
        + (stop_hits / n_toks) * 0.2
        + (F.lit(1.0) - n_upper / n_chars) * 0.1
    )
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    staged = d.select(
        "doc_id",
        (stop_hits / n_toks >= 0.03).alias("g_lang"),
        (quality >= 0.5).alias("g_quality"),
        n_toks.between(5, 10000).alias("g_length"),
        F.md5(norm).alias("fp"))
    w_first = F.min("doc_id")
    firsts = staged.groupBy("fp").agg(w_first.alias("first_doc"))
    staged = staged.join(firsts, "fp") \
        .withColumn("g_unique", F.col("doc_id") == F.col("first_doc"))
    return staged.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("g_lang"), 1).otherwise(0)).alias("pass_lang"),
        F.sum(F.when(F.col("g_lang") & F.col("g_quality"), 1).otherwise(0))
        .alias("pass_quality"),
        F.sum(F.when(F.col("g_lang") & F.col("g_quality")
                     & F.col("g_length"), 1).otherwise(0))
        .alias("pass_length"),
        F.sum(F.when(F.col("g_lang") & F.col("g_quality")
                     & F.col("g_length") & F.col("g_unique"), 1)
              .otherwise(0)).alias("pass_dedup"))


_T5_SQL = f"""
WITH staged AS (
  SELECT doc_id,
    len(list_filter(string_split(lower(text),' '),
        x -> x IN {repr(_EN_STOPWORDS)})) * 1.0
      / len(string_split(lower(text),' ')) >= 0.03 AS g_lang,
    ( LEAST(len(string_split(lower(text),' ')) / 100.0, 1.0) * 0.4
    + (len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0 / len(text)) * 0.3
    + (len(list_filter(string_split(lower(text),' '),
           x -> x IN {repr(_EN_STOPWORDS)})) * 1.0
         / len(string_split(lower(text),' '))) * 0.2
    + (1.0 - len(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 / len(text)) * 0.1
    ) >= 0.5 AS g_quality,
    len(string_split(lower(text),' ')) BETWEEN 5 AND 10000 AS g_length,
    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
  FROM documents),
uniq AS (
  SELECT s.*, s.doc_id = MIN(s.doc_id) OVER (PARTITION BY fp) AS g_unique
  FROM staged s)
SELECT COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN g_lang THEN 1 ELSE 0 END) AS BIGINT) AS pass_lang,
  CAST(SUM(CASE WHEN g_lang AND g_quality THEN 1 ELSE 0 END) AS BIGINT)
    AS pass_quality,
  CAST(SUM(CASE WHEN g_lang AND g_quality AND g_length THEN 1 ELSE 0 END)
    AS BIGINT) AS pass_length,
  CAST(SUM(CASE WHEN g_lang AND g_quality AND g_length AND g_unique
    THEN 1 ELSE 0 END) AS BIGINT) AS pass_dedup
FROM uniq
"""


# ---- T6: PII redaction (emails/phones scrubbed before training).
#      The synthetic corpus contains no PII, so the op first injects
#      deterministic PII derived from doc_id — both engines build the
#      identical string — then redacts it, proving the scrub on data
#      that actually contains what it scrubs.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def t6_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    # cast to long: DuckDB len() is BIGINT and the driver hash is
    # type-sensitive (round-2 uncast-SUM bug class)
    n_emails = F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("long")
    red = F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(red, F.lit(_PHONE_RE)).cast("long")
    red = F.regexp_replace(red, _PHONE_RE, "<PHONE>")
    return (
        d.select("doc_id", n_emails.alias("n_emails"),
                 n_phones.alias("n_phones"), F.md5(red).alias("red_fp"))
        .orderBy("doc_id")
    )


_T6_SQL = rf"""
WITH aug AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or call +1-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
  FROM documents),
e AS (
  SELECT doc_id,
    len(regexp_extract_all(s, '{_EMAIL_RE}')) AS n_emails,
    regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g') AS s2
  FROM aug)
SELECT doc_id, n_emails,
  len(regexp_extract_all(s2, '{_PHONE_RE}')) AS n_phones,
  md5(regexp_replace(s2, '{_PHONE_RE}', '<PHONE>', 'g')) AS red_fp
FROM e ORDER BY doc_id
"""


# ---- T7: repetition statistics (Gopher-style quality rules: a doc
#      dominated by one repeated word/bigram is boilerplate). Explode→
#      count→max keeps everything JVM-side; the shuffle keys
#      (doc_id, token) are high-cardinality and skew-free, and the
#      per-doc join is co-partitioned on doc_id — linear at 100 TB.
def t7_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    words = d.select("doc_id", F.explode("ws").alias("tok"))
    wstat = (words.groupBy("doc_id", "tok").count()
             .groupBy("doc_id")
             .agg(F.sum("count").alias("n_words"),
                  F.max("count").alias("max_w")))
    bigrams = d.select(
        "doc_id",
        F.explode(F.zip_with(
            F.expr("slice(ws, 1, size(ws)-1)"),
            F.expr("slice(ws, 2, size(ws)-1)"),
            lambda a, b: F.concat_ws(" ", a, b))).alias("bg"))
    bstat = (bigrams.groupBy("doc_id", "bg").count()
             .groupBy("doc_id")
             .agg(F.sum("count").alias("n_bg"),
                  F.max("count").alias("max_b")))
    return (
        wstat.join(bstat, "doc_id", "left")
        .select("doc_id", "n_words",
                det_round(F.col("max_w") / F.col("n_words"), 6)
                .alias("rep_word_frac"),
                det_round(F.col("max_b") / F.col("n_bg"), 6)
                .alias("rep_bigram_frac"))
        .orderBy("doc_id")
    )


_T7_SQL = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (SELECT doc_id, unnest(w) AS tok,
                 generate_subscripts(w, 1) AS i FROM ws),
wcnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY 1, 2),
wstat AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                 MAX(c) AS max_w FROM wcnt GROUP BY 1),
bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bgr
       FROM words a JOIN words b
         ON a.doc_id = b.doc_id AND b.i = a.i + 1),
bcnt AS (SELECT doc_id, bgr, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bstat AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bg,
                 MAX(c) AS max_b FROM bcnt GROUP BY 1)
SELECT w.doc_id, w.n_words,
       FLOOR((w.max_w * 1.0 / w.n_words) * 1000000.0 + 0.5) / 1000000.0 AS rep_word_frac,
       FLOOR((b.max_b * 1.0 / b.n_bg) * 1000000.0 + 0.5) / 1000000.0 AS rep_bigram_frac
FROM wstat w LEFT JOIN bstat b USING (doc_id) ORDER BY doc_id
"""


# ---- T8: character-entropy quality signal. Low-entropy docs are
#      boilerplate/garbage (aaaaa...), abnormally high-entropy ones are
#      random blobs — both are standard pre-training filters. Counting
#      per-(doc, char) then folding H = log2(n) - Σ c·log2(c) / n keeps
#      the whole thing in two map-side-combined aggregations; the
#      (doc_id, char) shuffle key is high-cardinality and skew-free.
def t8_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.lower(F.col("text")).alias("lc"))
    # guard: sequence(1, 0) yields [1, 0] (descending), NOT empty —
    # an empty text must explode to zero rows to match the oracle's
    # empty range(1, 1)
    idx = F.when(F.length("lc") > 0,
                 F.sequence(F.lit(1), F.length("lc"))
                 ).otherwise(F.array().cast("array<int>"))
    chars = d.select(
        "doc_id", F.explode(idx).alias("i"), F.col("lc")
    ).select("doc_id", F.expr("substr(lc, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    log2 = lambda x: F.log(x) / F.log(F.lit(2.0))  # noqa: E731
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * log2(F.col("c"))).alias("clogc"),
        F.count("*").alias("n_distinct_chars"))
    return (
        per_doc.select(
            "doc_id", F.col("n").alias("n_chars_lc"), "n_distinct_chars",
            det_round(log2(F.col("n")) - F.col("clogc") / F.col("n"), 4)
            .alias("char_entropy"))
        .orderBy("doc_id")
    )


_T8_SQL = """
WITH chars AS (
  SELECT doc_id, substr(lower(text), CAST(i AS INT), 1) AS ch
  FROM documents, UNNEST(range(1, len(text) + 1)) AS t(i)),
counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
per_doc AS (
  SELECT doc_id, SUM(c) AS n, SUM(c * log2(c)) AS clogc,
         COUNT(*) AS n_distinct_chars
  FROM counts GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_lc, n_distinct_chars,
       FLOOR((log2(n) - clogc / n) * 10000.0 + 0.5) / 10000.0 AS char_entropy
FROM per_doc ORDER BY doc_id
"""


# ---- T9: corpus bigram LM scoring (perplexity-proxy quality filter,
#      the KenLM-style step real pipelines run). Two corpus-keyed
#      aggregations build the LM (unigram + bigram counts); each doc's
#      bigram stream joins the model and folds log-probs IN POSITION
#      ORDER (array_sort + aggregate), so the FP sum is bit-identical
#      across engines. Scale: the (w1) join key is Zipf-skewed — at
#      100 TB the hot-word keys go through AQE skew-join or the salted
#      join helper (operators/skew.py); counts tables are corpus-wide
#      aggregates a real deployment materializes once and reuses.
def t9_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.posexplode(_tokens()).alias("pos", "w"))
    wn = Window.partitionBy("doc_id").orderBy("pos")
    bg = (tok.select("doc_id", "pos", F.col("w").alias("w1"),
                     F.lead("w").over(wn).alias("w2"))
          .filter(F.col("w2").isNotNull()))
    # the last token of each doc starts no bigram — the conditional
    # denominator counts CONTEXT occurrences, i.e. bigram starts
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    scored = (bg.join(c2, ["w1", "w2"]).join(c1, "w1")
              .select("doc_id", "pos",
                      (F.log("c2") - F.log("c1")).alias("logp")))
    per = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                    F.lit(0.0), lambda a, x: a + x["logp"]).alias("s"))
    return (per.select(
        "doc_id", "n_bigrams",
        det_round(F.col("s") / F.col("n_bigrams"), 6).alias("avg_logp"))
        .orderBy("doc_id"))


_T9_SQL = """
WITH tok AS (
  SELECT doc_id, i AS pos, t[CAST(i AS INT) + 1] AS w
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
        FROM documents), UNNEST(range(len(t))) AS u(i)),
bg AS (
  SELECT doc_id, pos, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok QUALIFY w2 IS NOT NULL),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT doc_id, pos, ln(c2) - ln(c1) AS logp
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
SELECT doc_id, COUNT(*) AS n_bigrams,
       FLOOR((list_sum(list(logp ORDER BY pos)) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---- T10: per-document TF-IDF keyword extraction ---------------------
def t10_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword /
    topic-signal extractor for corpus exploration and quality
    clustering. idf = ln((N+1)/(df+1)) with add-one smoothing.

    Scale design (100 TB): tf is one (doc_id, term) partial-agg
    shuffle over the exploded tokens; df is a second, far smaller,
    term-keyed aggregation of the tf rows (not the raw tokens). The
    corpus size N is a scalar broadcast. The top-k window partitions
    on doc_id — the corpus's natural clustering — so ranking is
    shuffle-local. Scores round to 6 decimals: ln() is libm-
    dependent in the last bits across engines."""
    from pyspark.sql.window import Window
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    total = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term").crossJoin(F.broadcast(total))
        .withColumn("score", det_round(
            F.col("tf") * F.log((F.col("n_docs") + 1)
                                / (F.col("dfreq") + 1)), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "dfreq", "score",
                F.col("rk").cast("int").alias("rk"))
        .orderBy("doc_id", "rk")
    )


_T10_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, dfreq,
         FLOOR((tf * ln((n_docs + 1) * 1.0 / (dfreq + 1))) * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN total),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rk
  FROM scored)
SELECT doc_id, term, tf, dfreq, score, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
"""


# ---- T11: BPE merge-pair counting (one tokenizer-training round) -----
def t11_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training at corpus scale:
    count within-word adjacent character pairs and surface the top
    merge candidates — exactly the statistic a distributed tokenizer
    trainer recomputes each merge round. One explode + one pair-keyed
    partial-agg shuffle; the top-k is ORDER BY + LIMIT, which Spark
    plans as TakeOrderedAndProject (per-partition heaps, no global
    sort). Pair extraction is substr over an index sequence — all
    JVM codegen, no Python."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(_tokens()).alias("w")).filter(
        F.length("w") >= 2)
    idx = F.sequence(F.lit(1), F.length("w") - 1)
    pairs = words.select(
        F.explode(F.transform(
            idx, lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"))
    return (
        pairs.groupBy("pair").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_T11_SQL = """
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
pairs AS (
  SELECT substr(w, CAST(g.i AS INT), 2) AS pair
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) g
  WHERE len(w) >= 2)
SELECT pair, COUNT(*) AS n FROM pairs
GROUP BY pair ORDER BY n DESC, pair LIMIT 20
"""


# ---- T12: Zipf-law fit over the vocabulary ---------------------------
def t12_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scaling-law statistics: least-squares fit of
    log(frequency) against log(rank) over the top-100 terms — the
    Zipf slope every corpus card reports — plus vocabulary size and
    token count. The regression is CLOSED-FORM inside the engine
    (Σx, Σy, Σxy, Σx² → slope/intercept): per-term log products cast
    to DECIMAL before summing, so the cross-row aggregation order
    cannot perturb a bit; the one division happens once on the exact
    sums. Two shuffles total (term count, top-k).

    Scale note (100 TB): the top-100 selection is orderBy + limit,
    which Spark plans as TakeOrderedAndProject — per-partition top-k
    heaps merged on the driver — NOT a global-sort window. A
    row_number window with no partition spec (the naive spelling)
    would move the entire vocabulary (10^8-10^9 terms at corpus
    scale) into ONE partition; here only 100 rows ever leave the
    parallel stage. The rank over those 100 survivors is a bounded
    array sort (collect_list → sort_array → posexplode) — no window
    operator anywhere in the plan, so nothing can ever fall back to
    a whole-data single-partition sort."""
    d = _t(spark, sf_dir, "documents")
    freq = (d.select(F.explode(_tokens()).alias("term"))
            .groupBy("term").agg(F.count("*").alias("c")))
    top100 = freq.orderBy(F.desc("c"), "term").limit(100)
    top = (top100
           .agg(F.sort_array(F.collect_list(F.struct(
               (-F.col("c")).alias("negc"), "term", "c"))).alias("arr"))
           .select(F.posexplode("arr").alias("pos", "s"))
           .select(F.col("s.term").alias("term"), F.col("s.c").alias("c"),
                   (F.col("pos") + 1).alias("rk")))
    dec = "decimal(28,15)"
    x = F.log(F.col("rk").cast("double"))
    y = F.log(F.col("c").cast("double"))
    sums = top.agg(
        F.count("*").alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sxx"))
    totals = freq.agg(F.count("*").alias("vocab"),
                      F.sum("c").alias("tokens"))
    slope = ((F.col("n") * F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double"))
             / (F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")))
    return (
        sums.crossJoin(totals)
        .select("vocab", F.col("tokens").cast("long").alias("tokens"),
                det_round(slope, 6).alias("zipf_slope"),
                det_round((F.col("sy").cast("double")
                           - slope * F.col("sx").cast("double"))
                          / F.col("n"), 6).alias("zipf_intercept"))
    )


_T12_SQL = """
WITH freq AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
        FROM documents)
  GROUP BY term),
top AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk
  FROM freq QUALIFY rk <= 100),
sums AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(28,15))) AS sx,
         SUM(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(28,15))) AS sy,
         SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(c AS DOUBLE))
             AS DECIMAL(28,15))) AS sxy,
         SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
             AS DECIMAL(28,15))) AS sxx
  FROM top),
totals AS (SELECT COUNT(*) AS vocab, CAST(SUM(c) AS BIGINT) AS tokens
           FROM freq)
SELECT vocab, tokens,
       FLOOR(((n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
              * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(sx AS VARCHAR) AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
       FLOOR(((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
              - (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / n) * 1000000.0 + 0.5) / 1000000.0 AS zipf_intercept
FROM sums, totals
"""


# ---- T13: context-window chunking -----------------------------------
def t13_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context windows — THE preprocessing step between a raw
    corpus and a trainer: each document splits into 64-token windows
    with stride 48 (16-token overlap), emitting per chunk its token
    offset, length, and boundary tokens (what an index/loader needs
    to slice the doc without re-tokenizing). Entirely JVM-side:
    split + one explode(sequence) per doc — no UDF, no shuffle
    before the display sort; chunk counts are arithmetic on token
    counts, so output size is predictable (Σ ceil(n/stride)) and
    partitions inherit the corpus layout at any scale."""
    W, S = 64, 48
    d = _t(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.split(F.lower(F.col("text")), " ")
                    .alias("t"))
           .withColumn("n", F.size("t").cast("long")))
    n_chunks = F.when(F.col("n") <= W, F.lit(1).cast("long")).otherwise(
        F.ceil((F.col("n") - W) / F.lit(float(S))).cast("long") + 1)
    c = tok.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"),
                                          n_chunks - 1)))
    start = (F.col("chunk_idx") * S).cast("long")
    n_toks = F.least(F.lit(W).cast("long"), F.col("n") - start)
    return (
        c.select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("start_tok"),
            n_toks.alias("n_toks"),
            F.element_at("t", (start + 1).cast("int")).alias("first_tok"),
            F.element_at("t", (start + n_toks).cast("int"))
            .alias("last_tok"))
        .orderBy("doc_id", "chunk_idx")
    )


_T13_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t,
         len(string_split(lower(text), ' ')) AS n
  FROM documents),
chunks AS (
  SELECT doc_id, n, t, g.i AS chunk_idx, g.i * 48 AS start_tok,
         LEAST(64, n - g.i * 48) AS n_toks
  FROM tok, LATERAL (SELECT unnest(range(0,
       CASE WHEN n <= 64 THEN 1
            ELSE CAST(CEIL((n - 64) / 48.0) AS BIGINT) + 1 END)) AS i) g)
SELECT doc_id, chunk_idx, start_tok, n_toks,
       t[start_tok + 1] AS first_tok,
       t[start_tok + n_toks] AS last_tok
FROM chunks ORDER BY doc_id, chunk_idx
"""



# ---- T14: iterated BPE training (K merge rounds) ---------------------
_T14_ROUNDS = 8


def t14_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE tokenizer training — the loop a real trainer
    runs, not just T11's single pair count: K=8 rounds of
    count-pairs -> pick-best -> merge-everywhere over the corpus
    word-frequency table.

    Scale shape: training operates on the DISTINCT-word frequency
    table (vocabulary-sized, built with one shuffle from the
    corpus), never the corpus itself — the classic BPE trainer
    decomposition. Each round is ONE pair-keyed map-side-combined
    aggregate over the vocab plus a 1-row driver collect (the
    argmax merge decision is inherently global and scalar — the
    same bounded-driver pattern as A6's k-means centroids); the
    merge itself is a narrow per-row string replace, JVM codegen,
    greedy left-to-right exactly like the reference trainers. Words
    are kept as \x01-delimited symbol strings so a merge is a
    single replace() with no symbol-boundary ambiguity.
    """
    return spark.createDataFrame(
        _bpe_merges(spark, sf_dir),
        "round INT, left_sym STRING, right_sym STRING, "
        "merged STRING, n BIGINT")


def _bpe_merges(spark: SparkSession,
                sf_dir: str) -> list[tuple[int, str, str, str, int]]:
    """T14's training loop, factored so T15 (encode) can reuse the
    trained merge table. Returns [(round, left, right, merged, n)] —
    K bounded scalar rows, the same bounded-driver state as A6's
    centroids."""
    SEP = "\x01"
    d = _t(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(_tokens()).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("cnt"))
             .select(F.concat(
                 F.lit(SEP),
                 F.regexp_replace("w", "(.)", "$1" + SEP)).alias("syms"),
                 "cnt"))
    vocab = scratch_persist(vocab)
    rows = []
    for r in range(1, _T14_ROUNDS + 1):
        syms_list = F.filter(F.split("syms", SEP), lambda x: x != "")
        pairs = (vocab
                 # 1-symbol words have no pairs — and sequence(1, 0)
                 # DESCENDS, so they must not reach the transform
                 .filter(F.size(syms_list) >= 2)
                 .select(F.explode(F.transform(
                     F.sequence(F.lit(1), F.size(syms_list) - 1),
                     lambda i: F.concat(
                         F.element_at(syms_list, i), F.lit(SEP),
                         F.element_at(syms_list, i + 1)))).alias("pair"),
                     "cnt")
                 .groupBy("pair").agg(F.sum("cnt").alias("n"))
                 .orderBy(F.desc("n"), "pair").limit(1).collect())
        if not pairs:
            break
        pair, n = pairs[0]["pair"], int(pairs[0]["n"])
        a, b = pair.split(SEP)
        rows.append((r, a, b, a + b, n))
        # lazy merge chain over the ONE persisted round-0 vocab:
        # round r's plan is r stacked replace()s (pure codegen, no
        # per-round cache rewrite) feeding the pair aggregate — K
        # bounded, so plan depth stays trivial and each round's job
        # only pays the aggregate, not a cache materialization
        vocab = vocab.select(
            F.replace(F.col("syms"), F.lit(SEP + a + SEP + b + SEP),
                      F.lit(SEP + a + b + SEP)).alias("syms"), "cnt")
    return rows


def _t14_parts() -> list[str]:
    """The training CTE chain (v0..vK vocab states, p1..pK picked
    merges) shared by the T14 and T15 oracles."""
    S = "chr(1)"
    # every v{r} is referenced twice (by p{r+1} and v{r+1}): without
    # MATERIALIZED DuckDB inlines the chain and the replay blows up
    # 2^K — 2.5 s -> 0.05 s at sf0.01
    parts = [f"""v0 AS MATERIALIZED (
  SELECT {S} || regexp_replace(w, '(.)', '\\1' || {S}, 'g') AS syms, cnt
  FROM (SELECT w, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY w))"""]
    for r in range(1, _T14_ROUNDS + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT split_part(pair, {S}, 1) AS a, split_part(pair, {S}, 2) AS b,
         CAST(n AS BIGINT) AS n
  FROM (SELECT pair, SUM(cnt) AS n
        FROM (SELECT unnest(list_transform(range(1, len(l)),
                     i -> l[i] || {S} || l[i+1])) AS pair, cnt
              FROM (SELECT list_filter(string_split(syms, {S}),
                           x -> x <> '') AS l, cnt FROM v{r-1}))
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1))""")
        parts.append(f"""v{r} AS MATERIALIZED (
  SELECT replace(syms, {S}||a||{S}||b||{S}, {S}||a||b||{S}) AS syms, cnt
  FROM v{r-1} CROSS JOIN p{r})""")
    return parts


def _t14_sql() -> str:
    """DuckDB recursive-merge oracle: the same K rounds as chained
    CTEs — identical greedy replace(), identical (n DESC, pair ASC)
    tie-break — so the merge tables must agree row-for-row."""
    parts = _t14_parts()
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, n FROM p{r}"
        for r in range(1, _T14_ROUNDS + 1))
    return "WITH " + ",\n".join(parts) + "\n" + unions + "\nORDER BY round"


_T14_SQL = _t14_sql()


# ---- T15: tokenizer APPLY (encode the corpus with T14's merges) ------
def t15_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode half of the tokenizer loop: apply T14's trained
    merge table to every document and report per-doc token counts and
    compression — train (T14) → apply (T15) is the pipeline a real
    tokenizer runs over a corpus.

    Scale shape: the K merges are replayed on the DISTINCT
    vocabulary only (narrow literal replaces, one codegen stage over
    vocab-sized data) — the corpus never re-tokenizes; per-doc stats
    come from joining corpus (doc_id, word) tokens to the encoded
    vocab, where AQE broadcasts the vocab side. The merge table is K
    scalar driver rows (the A6 centroid pattern), identical to
    training because per-word greedy replay is order-deterministic.
    """
    SEP = "\x01"
    merges = _bpe_merges(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(_tokens()).alias("w"))
            .filter(F.col("w") != ""))
    vocab = toks.select("w").distinct().select(
        "w",
        F.concat(F.lit(SEP),
                 F.regexp_replace("w", "(.)", "$1" + SEP)).alias("syms"))
    for _r, a, b, _m, _n in merges:
        vocab = vocab.withColumn(
            "syms", F.replace(F.col("syms"), F.lit(SEP + a + SEP + b + SEP),
                              F.lit(SEP + a + b + SEP)))
    enc = vocab.select(
        "w", F.length("w").alias("n_chars"),
        F.size(F.filter(F.split("syms", SEP),
                        lambda x: x != "")).alias("n_toks"))
    return (toks.join(enc, "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_chars").cast("long").alias("n_base_syms"),
                 F.sum("n_toks").cast("long").alias("n_tokens"))
            .select("doc_id", "n_words", "n_base_syms", "n_tokens",
                    det_round(F.col("n_base_syms").cast("double")
                              / F.col("n_tokens"), 5)
                    .alias("compression"))
            .orderBy("doc_id"))


def _t15_sql() -> str:
    """Oracle: replay training (shared _t14_parts CTEs), re-derive
    the encoded vocabulary with the same chained replaces, join the
    corpus tokens back on."""
    S = "chr(1)"
    parts = _t14_parts()
    parts.append("""toks AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents) WHERE w <> '')""")
    parts.append(f"""w0 AS (
  SELECT w, {S} || regexp_replace(w, '(.)', '\\1' || {S}, 'g') AS syms
  FROM (SELECT DISTINCT w FROM toks))""")
    for r in range(1, _T14_ROUNDS + 1):
        parts.append(f"""w{r} AS MATERIALIZED (
  SELECT w, replace(syms, {S}||a||{S}||b||{S}, {S}||a||b||{S}) AS syms
  FROM w{r-1} CROSS JOIN p{r})""")
    parts.append(f"""enc AS (
  SELECT w, length(w) AS n_chars,
         len(list_filter(string_split(syms, {S}), x -> x <> '')) AS n_toks
  FROM w{_T14_ROUNDS})""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_base_syms,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       FLOOR(CAST(CAST(SUM(n_chars) AS VARCHAR) AS DOUBLE) / SUM(n_toks) * 100000.0 + 0.5) / 100000.0 AS compression
FROM toks JOIN enc USING (w)
GROUP BY doc_id ORDER BY doc_id""")


_T15_SQL = _t15_sql()


# ---- T16: classifier-based quality filtering (hashing trick) ---------
_T16_DIM = 64          # hashed feature buckets
_T16_WSCALE = 1000     # weights are integers in [-1000, 1000] / 1000


def t16_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-form quality filtering — the CCNet/GPT-3-style
    'score every document with a cheap linear model, keep the
    positive slice' step (X11 is the lexical-heuristic variant; this
    is the model-based one).

    Features are hashing-trick unigram buckets (md5 → one of 64
    buckets, the engine-portable idiom X2 established); the model is
    a fixed linear layer whose integer weights derive from md5 of
    the bucket id — a stand-in for trained weights with the same
    plan shape. The logit is computed EXACTLY: every token
    contributes an integer weight, the per-doc sum S is integer
    (shuffle-order-invariant), and the only float op is the final
    single division — bit-identical IEEE given identical integer
    inputs, so the value is deliberately NOT rounded (rounding an
    exact quotient reintroduces engine-specific half-way rules —
    0.075025 rounds differently in Java HALF_UP vs C rint).

    Scale: one map-side-combined aggregate per doc; weights are an
    inline expression of the bucket id (no join, nothing broadcast);
    the shuffle carries (doc_id, S, n) only."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(_tokens()).alias("w"))
            .filter(F.col("w") != ""))
    bucket = (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10)
              .cast("bigint") % _T16_DIM)
    weight = (F.conv(F.substring(
        F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % (2 * _T16_WSCALE + 1)) - _T16_WSCALE
    per_doc = (toks.select("doc_id", weight.alias("wt"))
               .groupBy("doc_id")
               .agg(F.sum("wt").cast("long").alias("s"),
                    F.count("*").cast("long").alias("n_tokens")))
    logit = (F.col("s").cast("double")
             / (F.col("n_tokens") * float(_T16_WSCALE)))
    return (per_doc.select(
        "doc_id", "n_tokens", logit.alias("logit"),
        (F.col("s") > 0).alias("kept"))
        .orderBy("doc_id"))


_T16_SQL = f"""
WITH toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents) WHERE w <> ''),
feat AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM} AS h
  FROM toks),
wts AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w' || CAST(h AS VARCHAR)), 1, 8))
              AS BIGINT) % {2 * _T16_WSCALE + 1} - {_T16_WSCALE} AS wt
  FROM feat),
per_doc AS (
  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM wts GROUP BY doc_id)
SELECT doc_id, n_tokens,
       CAST(s AS DOUBLE) / (n_tokens * {_T16_WSCALE}.0) AS logit,
       s > 0 AS kept
FROM per_doc ORDER BY doc_id
"""


# ---- T17: CCNet-style perplexity bucketing ---------------------------
_T17_REF_SOURCE = "src0"   # the 'reference domain' (CCNet trains on wiki)


def t17_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC 2020): train a language model on a trusted reference
    domain, score EVERY document by per-token negative logprob under
    it, and split each language into head/middle/tail terciles —
    head is the most reference-like slice a pretraining mix keeps.

    The LM here is an add-one-smoothed unigram over the reference
    slice (source = 'src0'); T9 is the in-domain bigram variant —
    the CCNet twist is exactly that the model is OUT-of-domain for
    most rows, so the score ranks domain similarity.

    Determinism: per-doc NLL sums double logs in a per-word sorted
    aggregate (T9's ordered-sum idiom — word keys are unique within
    a doc, so the sort is total); terciles are ntile(3) over the
    ROUNDED score with doc_id tiebreak — both engines rank the
    identical ordering.

    Scale: reference counts are one map-side-combined agg over the
    (small) trusted slice; scoring joins per-(doc, word) counts to
    the reference vocabulary on the word key — the same Zipf-hot
    token shuffle T9 documents (AQE skew split handles 'the'); the
    vocab-size/token-count scalars ride a 1-row broadcast. The
    tercile assignment is HIERARCHICAL (x5's idiom on a score
    order): lang cardinality is tiny, so a plain partitionBy(lang)
    ntile window would pull a whole language through one task; docs
    band on floor(8·avg_nll) — score bands are contiguous ranges of
    the (avg_nll, doc_id) order — the rank window partitions on
    (lang, band), fully parallel, broadcast per-(lang, band) offsets
    restore the exact per-lang rank, and ntile(3) is computed from
    (rank, n_lang) in closed form (first n%3 buckets hold n//3+1
    rows — the SQL-standard NTILE split both engines implement)."""
    from pyspark.sql.window import Window
    d = _t(spark, sf_dir, "documents")
    tok = (d.select("doc_id", "lang", "source",
                    F.explode(_tokens()).alias("w"))
           .filter(F.col("w") != ""))
    # ONE tokenize+explode pass feeds both the reference counts and
    # the scoring side (persisted: the raw explode is the expensive
    # half; recomputing it doubles the corpus scans)
    per_word = scratch_persist(
        tok.groupBy("doc_id", "lang", "source", "w")
        .agg(F.count("*").alias("cnt")))
    refc = (per_word.filter(F.col("source") == _T17_REF_SOURCE)
            .groupBy("w").agg(F.sum("cnt").cast("long").alias("c")))
    stats = refc.agg(F.sum("c").cast("long").alias("n_ref"),
                     F.count("*").cast("long").alias("v_ref"))
    scored = (per_word.join(refc, "w", "left")
              .crossJoin(F.broadcast(stats)))
    logp = (F.log(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            - F.log(F.col("n_ref") + F.col("v_ref") + F.lit(1)))
    per_doc = (scored.select(
        "doc_id", "lang",
        F.col("cnt"), (F.col("cnt") * logp).alias("wl"), "w")
        .groupBy("doc_id", "lang")
        .agg(F.sum("cnt").cast("long").alias("n_tok"),
             F.aggregate(
                 F.array_sort(F.collect_list(F.struct("w", "wl"))),
                 F.lit(0.0), lambda a, x: a + x["wl"]).alias("s")))
    nll = det_round(-F.col("s") / F.col("n_tok"), 6)
    # band sentinel MAX_INT: a NULL score stays a member and sorts
    # LAST under the ASC order on both engines (explicit nulls_last —
    # DuckDB's default; Spark's asc default is nulls FIRST); a NULL
    # band key would silently fall out of the equi-join below.
    # persisted: the per-doc NLL aggregate (the join+ordered-sum the
    # docstring calls the expensive half) feeds BOTH the rank window
    # and the band counts.
    from ..hier import hier_rank
    docs = (per_doc.select("doc_id", "lang", "n_tok",
                           nll.alias("avg_nll"))
            .withColumn("band",
                        F.coalesce(F.floor(F.col("avg_nll") * 8)
                                   .cast("int"),
                                   F.lit(2147483647))))
    ranked = hier_rank(
        docs, ["lang"],
        [F.asc_nulls_last("avg_nll"), F.col("doc_id")],
        "band", total_col="n_lang")
    # SQL-standard NTILE(3) from (rk, n_lang): the first n%3 buckets
    # hold n//3+1 rows, the rest n//3
    tercile = F.expr(
        "CASE WHEN rk <= (n_lang % 3) * (n_lang DIV 3 + 1) "
        "THEN (rk - 1) DIV (n_lang DIV 3 + 1) + 1 "
        "ELSE (n_lang % 3) + (rk - 1 - (n_lang % 3) * "
        "(n_lang DIV 3 + 1)) DIV greatest(n_lang DIV 3, 1) + 1 END")
    bucket = (F.when(F.col("tercile") == 1, "head")
              .when(F.col("tercile") == 2, "middle").otherwise("tail"))
    return (ranked.withColumn("tercile", tercile)
            .select("doc_id", "lang", "n_tok", "avg_nll",
                    bucket.alias("ppl_bucket"))
            .orderBy("doc_id"))


_T17_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, source, w FROM (
    SELECT doc_id, lang, source,
           unnest(string_split(lower(text), ' ')) AS w
    FROM documents) WHERE w <> ''),
refc AS (
  SELECT w, COUNT(*) AS c FROM tok
  WHERE source = '{_T17_REF_SOURCE}' GROUP BY w),
stats AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_ref,
         CAST(COUNT(*) AS BIGINT) AS v_ref FROM refc),
per_word AS (
  SELECT doc_id, lang, w, COUNT(*) AS cnt
  FROM tok GROUP BY doc_id, lang, w),
scored AS (
  SELECT doc_id, lang, w, cnt,
         cnt * (ln(COALESCE(c, 0) + 1) - ln(n_ref + v_ref + 1)) AS wl
  FROM per_word LEFT JOIN refc USING (w) CROSS JOIN stats),
per_doc AS (
  SELECT doc_id, lang, CAST(SUM(cnt) AS BIGINT) AS n_tok,
         list_sum(list(wl ORDER BY w)) AS s
  FROM scored GROUP BY doc_id, lang),
ranked AS (
  SELECT doc_id, lang, n_tok, FLOOR((-s / n_tok) * 1000000.0 + 0.5) / 1000000.0 AS avg_nll
  FROM per_doc),
tiled AS (
  SELECT *, NTILE(3) OVER (PARTITION BY lang
                           ORDER BY avg_nll, doc_id) AS tercile
  FROM ranked)
SELECT doc_id, lang, n_tok, avg_nll,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM tiled ORDER BY doc_id
"""


# ---- T18: Unicode script ID (beyond T1's ASCII stopwords) -----------
# Codepoint ranges written as escapes so the Spark regex and the
# DuckDB regex are the SAME literal string. The synthetic corpus is
# ASCII, so non-Latin behavior is exercised on deterministic planted
# docs (UNICODE_PLANTS) unioned in BOTH engines.
_SCRIPT_RANGES = (
    ("han", "一-鿿"),
    ("kana", "぀-ヿ"),
    ("hangul", "가-힯"),
    ("arabic", "؀-ۿ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("latin", "a-zA-Z"),
)

# (doc_id, text): Chinese near-dup pair + exact dup (d19's planted
# truth), Japanese kana, Korean, Arabic, Cyrillic. IDs far above the
# corpus range.
UNICODE_PLANTS = [
    (910001, "机器学习模型需要大量高质量的训练数据来提升性能表现和泛化能力"),
    (910002, "机器学习模型需要大量高质量的训练数据来提升性能表现和泛化效果"),
    (910003, "机器学习模型需要大量高质量的训练数据来提升性能表现和泛化能力"),
    (910004, "今天天气很好我们一起去公园散步看花赏景放松心情"),
    (910005, "すもももももももものうちももにもいろいろなももがある"),
    (910006, "こんにちは世界プログラミングはとても楽しいです"),
    (910007, "안녕하세요 세계 딥러닝 모델 학습 데이터 구축 방법"),
    (910008, "데이터 엔지니어링 파이프라인 설계와 운영 모범 사례"),
    (910009, "التعلم الآلي يحتاج إلى بيانات تدريب عالية الجودة"),
    (910010, "معالجة اللغة الطبيعية مجال بحثي ممتع ومفيد"),
    (910011, "машинное обучение требует качественных обучающих данных"),
]


def unicode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ UNICODE_PLANTS, (doc_id, text) only — shared by
    T18 and D19 so the Spark corpus and the oracle corpus cannot
    drift."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    p = spark.createDataFrame(UNICODE_PLANTS, "doc_id BIGINT, text STRING")
    return d.unionByName(p)


def unicode_corpus_sql() -> str:
    plants = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS doc_id, '{t}' AS text"
        for i, t in UNICODE_PLANTS)
    return f"SELECT doc_id, text FROM documents UNION ALL {plants}"


def t18_script_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document writing-script classification by codepoint-range
    counts (Han / kana / Hangul / Arabic / Cyrillic / Latin), the
    T1 extension a multilingual corpus needs: T1's stopword-ratio
    heuristic can only say en/other and silently calls every CJK doc
    'other'. argmax with a FIXED tie-break order so both engines
    pick identically; all-zero counts → 'other'.

    Scale: one regexp_count per range per row — counts matches
    WITHOUT materializing a replacement string (the
    length(regexp_replace()) formulation allocated a new string per
    row per class and measured 2× slower at sf1); pure whole-stage
    codegen, no shuffle at all (the orderBy is the gate's
    presentation sort). The oracle keeps the replace-based spelling
    (DuckDB lacks regexp_count); equivalence is definitional — a
    single-char class match count equals the surviving length."""
    c = unicode_corpus(spark, sf_dir)
    cnt = {s: F.regexp_count(F.col("text"), F.lit(f"[{r}]"))
           for s, r in _SCRIPT_RANGES}
    mx = F.greatest(*cnt.values())
    pred = F.when(mx == F.lit(0), F.lit("other"))
    for s, _ in _SCRIPT_RANGES:
        pred = pred.when(cnt[s] == mx, F.lit(s))
    return (c.select("doc_id", pred.otherwise("other").alias("script"))
            .orderBy("doc_id"))


def _t18_sql() -> str:
    cols = ", ".join(
        f"length(regexp_replace(text, '[^{r}]', '', 'g')) AS c_{s}"
        for s, r in _SCRIPT_RANGES)
    mx = "greatest(" + ", ".join(f"c_{s}" for s, _ in _SCRIPT_RANGES) + ")"
    whens = " ".join(f"WHEN c_{s} = mx THEN '{s}'"
                     for s, _ in _SCRIPT_RANGES)
    return f"""
WITH corpus AS ({unicode_corpus_sql()}),
counted AS (SELECT doc_id, {cols} FROM corpus),
m AS (SELECT doc_id, *, {mx} AS mx FROM counted)
SELECT doc_id, CASE WHEN mx = 0 THEN 'other' {whens}
       ELSE 'other' END AS script
FROM m ORDER BY doc_id
"""


_T18_SQL = _t18_sql()


# ---- T19: per-source KL divergence (domain-mixture diagnostic) -------
def t19_source_kl_divergence(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """How far each source's token distribution sits from the
    corpus-wide mixture: KL(source ‖ corpus) in nats, plus token
    mass and vocabulary size per source — the diagnostic a data-mix
    curator reads before re-weighting sources (a source with tiny KL
    adds volume, not diversity; a huge-KL source shifts the mixture).

    Determinism: the KL sum is a per-source fold over (w, term)
    pairs in sorted-w order (T9's ordered-sum idiom) so the float
    accumulation order is identical in both engines.

    Scale: token text shuffles once into (source, w) partial counts;
    everything after is count-sized. The fold array is one entry per
    DISTINCT (source, word) — bounded by vocabulary, not corpus; on
    an open-vocab web corpus apply a document-frequency floor first
    (T10's df relation) to cap it."""
    d = _t(spark, sf_dir, "documents")
    tok = (d.select("source", F.explode(_tokens()).alias("w"))
           .filter(F.col("w") != ""))
    cs = scratch_persist(
        tok.groupBy("source", "w").agg(F.count("*").alias("c_sw")))
    cw = cs.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    ns = cs.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    ntot = cs.agg(F.sum("c_sw").alias("n"))
    p = F.col("c_sw") / F.col("n_s")
    q = F.col("c_w") / F.col("n")
    terms = (cs.join(cw, "w").join(ns, "source")
             .crossJoin(F.broadcast(ntot))   # 1-row scalar
             .select("source", "w", "n_s",
                     (p * F.log(p / q)).alias("term")))
    return (terms.groupBy("source")
            .agg(F.max("n_s").cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("vocab"),
                 det_round(F.aggregate(
                     F.array_sort(F.collect_list(F.struct("w", "term"))),
                     F.lit(0.0), lambda a, x: a + x["term"]), 6)
                 .alias("kl_nats"))
            .orderBy("source"))


_T19_SQL = """
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents) WHERE w <> ''),
cs AS MATERIALIZED (
  SELECT source, w, COUNT(*) AS c_sw FROM tok GROUP BY source, w),
cw AS (SELECT w, SUM(c_sw) AS c_w FROM cs GROUP BY w),
ns AS (SELECT source, SUM(c_sw) AS n_s FROM cs GROUP BY source),
nt AS (SELECT SUM(c_sw) AS n FROM cs),
terms AS (
  SELECT source, w, n_s,
         (c_sw * 1.0 / n_s) * ln((c_sw * 1.0 / n_s) / (c_w * 1.0 / n))
           AS term
  FROM cs JOIN cw USING (w) JOIN ns USING (source), nt)
SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       FLOOR((list_sum(list(term ORDER BY w))) * 1000000.0 + 0.5) / 1000000.0 AS kl_nats
FROM terms GROUP BY source ORDER BY source
"""


# ---- T20: interpolated Kneser-Ney bigram LM scoring ------------------
_KN_D = 0.75


def t20_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average log-probability under an interpolated
    Kneser-Ney bigram LM trained on the corpus itself — the canonical
    smoothing (Kneser & Ney 1995; Chen & Goodman 1999) behind the
    KenLM-style perplexity filters every CCNet-descended curation
    pipeline runs. Extends T9's MLE scorer with the absolute-discount
    + continuation-probability backoff that makes unseen-context mass
    principled:

        P_KN(w2|w1) = (c(w1,w2) - D)/c(w1)
                      + D * N1+(w1,*)/c(w1) * N1+(*,w2)/N1+(*,*)

    with D = 0.75 (the Chen-Goodman default). N1+ are TYPE counts —
    the "how many distinct contexts" statistics that distinguish KN
    from Katz/MLE backoff.

    Determinism: every probability is composed from integer counts
    with an identical IEEE expression tree in both engines; ln() of
    identical doubles (t9 discipline); the per-doc sum is the ordered
    fold (array_sort + left fold / list_reduce(list_prepend(...))),
    then det_round(...,6).

    Scale (100 TB): the type tables c2/c1/ncw2 are vocabulary²-
    bounded, not corpus-bounded; they join among themselves first so
    the corpus-sized bigram stream shuffles ONCE — on (w1,w2) into
    the pre-scored type table — instead of once per statistic. The
    final groupBy(doc_id) rides the corpus's natural key. The fold
    array is per-document (bounded by doc length). No broadcast of
    the type table: at web scale bigram types are billions of rows,
    so the join stays a shuffle join and AQE handles the skewed
    stopword-pair keys."""
    from pyspark.sql.window import Window
    d = _t(spark, sf_dir, "documents")
    D = F.lit(_KN_D)
    tok = d.select("doc_id",
                   F.posexplode(_tokens()).alias("pos", "w"))
    wn = Window.partitionBy("doc_id").orderBy("pos")
    bg = (tok.select("doc_id", "pos", F.col("w").alias("w1"),
                     F.lead("w").over(wn).alias("w2"))
          .filter(F.col("w2").isNotNull()))
    bg = scratch_persist(bg)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"),
                              F.countDistinct("w2").alias("n1w1"))
    ncw2 = c2.groupBy("w2").agg(F.count("*").alias("ncw2"))
    nbt = c2.agg(F.count("*").alias("nbt"))   # 1-row scalar
    p = (((F.col("c2") - D) / F.col("c1"))
         + ((D * F.col("n1w1")) / F.col("c1"))
         * (F.col("ncw2") / F.col("nbt")))
    ptype = (c2.join(c1, "w1").join(ncw2, "w2")
             .crossJoin(F.broadcast(nbt))
             .select("w1", "w2", F.log(p).alias("logp")))
    scored = bg.join(ptype, ["w1", "w2"]).select("doc_id", "pos", "logp")
    per = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                    F.lit(0.0), lambda a, x: a + x["logp"]).alias("s"))
    return (per.select(
        "doc_id", "n_bigrams",
        det_round(F.col("s") / F.col("n_bigrams"), 6).alias("kn_avg_logp"))
        .orderBy("doc_id"))


_T20_SQL = f"""
WITH tok AS (
  SELECT doc_id, i AS pos, t[CAST(i AS INT) + 1] AS w
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
        FROM documents), UNNEST(range(len(t))) AS u(i)),
bg AS (
  SELECT doc_id, pos, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok QUALIFY w2 IS NOT NULL),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1, COUNT(DISTINCT w2) AS n1w1
       FROM bg GROUP BY w1),
ncw2 AS (SELECT w2, COUNT(*) AS ncw2 FROM c2 GROUP BY w2),
nbt AS (SELECT COUNT(*) AS nbt FROM c2),
ptype AS (
  SELECT w1, w2,
    ln( ((c2 - {_KN_D}) / c1)
        + (({_KN_D} * n1w1) / c1) * (ncw2 * 1.0 / nbt) ) AS logp
  FROM c2 JOIN c1 USING (w1) JOIN ncw2 USING (w2) CROSS JOIN nbt),
scored AS (
  SELECT doc_id, pos, logp FROM bg JOIN ptype USING (w1, w2))
SELECT doc_id, COUNT(*) AS n_bigrams,
  {det_round_sql('''list_reduce(
       list_prepend(CAST(0.0 AS DOUBLE), list(logp ORDER BY pos)),
       (a, x) -> a + x) / COUNT(*)''', 6)} AS kn_avg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---- T21: unigram-LM tokenizer training (SentencePiece-style) -------
_T21_MAX_WLEN = 8     # words longer than this are excluded (bounds the
                      # DP depth so the oracle's unrolled CTE chain and
                      # the Spark fold stay 8 steps; real trainers cap
                      # candidate piece length the same way)
_T21_MAX_PLEN = 4     # max candidate piece length
_T21_SEED = 200       # seed multi-char candidates (top by count)
_T21_ROUNDS = 3       # Viterbi-EM rounds
_T21_VOCAB = 80       # multi-char pieces kept after the final prune
_T21_SEP = "\x01"


def _t21_dr6(x: float) -> float:
    """Python spelling of det_round(...,6) — the driver-side M-step
    must round exactly like the oracle's FLOOR formula.

    Known libm seam (r10 advice, accepted): the M-step scores come
    from CPython's math.log while the oracle uses DuckDB's ln — both
    are the platform libm here, but a score landing EXACTLY on a
    0.5-ulp rounding boundary could in principle round apart across
    libm builds and flip a DP tie cross-engine. The 1e-6 rounding
    plus the 1e-5 FLOOR comparison key absorbs last-ulp drift in
    practice (pinned by the multi-SF oracle runs); if it ever bites,
    compute ln via one tiny Spark job so both sides share JVM
    semantics."""
    import math
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _t21_best_seg(wcol, score_map):
    """Viterbi segmentation of one word as a single codegen
    expression: an 8-step left fold (F.aggregate over positions)
    whose state is the array of per-prefix best (score, seg) pairs.
    Candidates at position j are the ≤4 pieces ending there; absent
    pieces null out via the map lookup and are filtered. Comparison
    key is FLOOR(sc*1e5+0.5) (a BIGINT — exact), ties broken by
    lexicographically smallest segmentation, the same (rounded score
    DESC, seg ASC) rule the oracle's ROW_NUMBER applies."""
    init = F.array(F.struct(F.lit(0.0).alias("sc"),
                            F.lit("").alias("seg")))

    def step(acc, j):
        def cand(l):
            prev = F.element_at(acc, j - l + 1)
            piece = wcol.substr(j - l + 1, l)
            return F.struct(
                (prev["sc"] + F.element_at(score_map, piece)).alias("sc"),
                F.concat(prev["seg"], F.lit(_T21_SEP), piece).alias("seg"))
        cands = F.filter(
            F.transform(F.sequence(F.lit(1),
                                   F.least(j, F.lit(_T21_MAX_PLEN))),
                        cand),
            lambda c: c["sc"].isNotNull())
        key = lambda c: F.floor(c["sc"] * F.lit(100000.0) + F.lit(0.5))
        m = F.array_max(F.transform(cands, key))
        best_seg = F.array_min(F.transform(
            F.filter(cands, lambda c: key(c) == m), lambda c: c["seg"]))
        best = F.element_at(
            F.filter(cands, lambda c: c["seg"] == best_seg), 1)
        return F.concat(acc, F.array(best))

    state = F.aggregate(F.sequence(F.lit(1), F.length(wcol)), init, step)
    return F.element_at(state, -1)["seg"]


def t21_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training — the OTHER canonical subword
    trainer next to T14's BPE: SentencePiece's unigram model (Kudo
    2018, "Subword Regularization"), here in its Viterbi-EM (hard-EM)
    variant: seed a candidate vocabulary from frequent substrings,
    then iterate (E) Viterbi-segment every word under the current
    piece log-probs and (M) re-estimate piece probabilities from the
    hard counts, pruning to a target vocabulary at the end. Hard-EM
    is the published Viterbi-training approximation of Kudo's full
    forward-backward E-step; the prune is frequency-based (Kudo
    prunes by likelihood loss — same shape, simpler criterion).

    Scale shape (100 TB): training runs on the DISTINCT-word
    frequency table (one shuffle from the corpus, T14's
    decomposition), never the corpus. The candidate vocabulary is
    BOUNDED (≤ _T21_SEED + alphabet), so each EM round is one narrow
    codegen pass over the vocab table (the DP fold — no shuffle, no
    Python), one piece-keyed vocab-bounded aggregate, and one
    bounded driver collect (≤ ~250 rows — the same bounded-driver
    state as T14's merge table / A6's centroids). Piece scores ship
    to executors as a map LITERAL, not a join: at any corpus size
    the model is KB-sized while the data is not.

    Determinism: piece scores are det_round(ln(c)-ln(T), 6) of
    integer counts — identical doubles in both engines; DP
    comparisons use the exact integer key FLOOR(sc*1e5+0.5) with a
    seg-string tie-break, so equal-product segmentations (counts
    {2,6} vs {3,4}) resolve identically everywhere. Reference:
    duckdb/postgres_scanner has no trainer; parity anchor is the
    published algorithm itself."""
    rows = _t21_train(spark, sf_dir)
    return spark.createDataFrame(
        rows, "rank INT, piece STRING, n_chars INT, cnt BIGINT, "
              "logprob DOUBLE")


def _t21_train(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The Viterbi-EM training loop, factored out so T22 (the encode
    half) can reuse the exact trained model; returns the final
    (rank, piece, n_chars, cnt, logprob) rows."""
    import math
    d = _t(spark, sf_dir, "documents")
    words = (d.select(F.explode(_tokens()).alias("w"))
             .filter((F.col("w") != "")
                     & (F.length("w") <= _T21_MAX_WLEN))
             .groupBy("w").agg(F.count("*").alias("freq")))
    words = scratch_persist(words)
    # seed: every substring of length 1.._T21_MAX_PLEN, weighted by
    # word frequency (multiplicity counted — "aaaa" has three "aa"s)
    subs = (words.select(F.explode(F.flatten(F.transform(
        F.sequence(F.lit(1),
                   F.least(F.lit(_T21_MAX_PLEN), F.length("w"))),
        lambda l: F.transform(
            F.sequence(F.lit(1), F.length("w") - l + 1),
            lambda i: F.col("w").substr(i, l))))).alias("piece"),
        "freq")
        .groupBy("piece").agg(F.sum("freq").alias("cnt")))
    subs = scratch_persist(subs)
    chars = sorted(r["piece"] for r in
                   subs.filter(F.length("piece") == 1).collect())
    multi = (subs.filter(F.length("piece") > 1)
             .orderBy(F.desc("cnt"), "piece").limit(_T21_SEED).collect())
    vocab = {r["piece"]: int(r["cnt"]) for r in multi}
    for r in subs.filter(F.length("piece") == 1).collect():
        vocab[r["piece"]] = int(r["cnt"])
    for _ in range(_T21_ROUNDS):
        tot = float(sum(vocab.values()))
        smap = {p: _t21_dr6(math.log(c) - math.log(tot))
                for p, c in vocab.items()}
        # the model ships as DATA (a 1-row broadcast map), not as a
        # map LITERAL: a literal would be inlined at each of the 32
        # DP candidate sites (240 entries × 32 = codegen blow-up)
        # and would change per round, defeating the codegen cache —
        # as data, every round reuses one compiled plan (measured
        # 20.6 s -> ~4 s at sf0.01)
        mdf = spark.createDataFrame([(smap,)], "m map<string,double>")
        seg = _t21_best_seg(F.col("w"), F.col("m"))
        counts = (words.crossJoin(F.broadcast(mdf))
                  .select(F.explode(F.filter(
                      F.split(seg, _T21_SEP),
                      lambda x: x != "")).alias("piece"), "freq")
                  .groupBy("piece").agg(F.sum("freq").alias("cnt"))
                  .collect())
        vocab = {r["piece"]: int(r["cnt"]) for r in counts}
        for ch in chars:
            # Laplace floor: an unused char must stay segmentable
            vocab.setdefault(ch, 1)
    kept = ([(p, c) for p, c in vocab.items() if len(p) == 1]
            + sorted(((p, c) for p, c in vocab.items() if len(p) > 1),
                     key=lambda pc: (-pc[1], pc[0]))[:_T21_VOCAB])
    tf = float(sum(c for _, c in kept))
    rows = [(p, len(p), c, _t21_dr6(math.log(c) - math.log(tf)))
            for p, c in sorted(kept, key=lambda pc: (-pc[1], pc[0]))]
    return [(i + 1, p, n, c, lp)
            for i, (p, n, c, lp) in enumerate(rows)]


def t22_unigram_lm_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode half of the unigram-LM tokenizer loop (Kudo 2018
    §2: segmentation = Viterbi decode under the trained piece
    log-probs): apply T21's trained model to every document and
    report per-doc token counts and compression — train (T21) →
    apply (T22), symmetric with the BPE pair T14 → T15.

    Scale shape (100 TB): the Viterbi DP runs on the DISTINCT-word
    table only (one narrow codegen pass — the same single-expression
    left fold as training, no shuffle, no Python), with the trained
    model shipped as a 1-row broadcast map exactly as in training
    (data, not literals — the codegen-cache lesson). Per-doc stats
    come from joining corpus (doc_id, word) tokens back to the
    encoded vocabulary, where AQE broadcasts the vocab side. Words
    longer than the trainer's max word length (_T21_MAX_WLEN — the
    model never saw them) take the char-fallback path: n_toks =
    n_chars, SentencePiece's byte-fallback analog, which keeps the
    encode contract total without an unbounded DP.

    Determinism: identical dr6 scores, identical FLOOR(sc*1e5+0.5)
    integer DP keys and seg-string tie-break as training, so both
    engines segment every word identically."""
    rows = _t21_train(spark, sf_dir)
    smap = {p: lp for _rank, p, _n, _c, lp in rows}
    mdf = spark.createDataFrame([(smap,)], "m map<string,double>")
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(_tokens()).alias("w"))
            .filter(F.col("w") != ""))
    vocab = toks.select("w").distinct()
    seg = _t21_best_seg(F.col("w"), F.col("m"))
    enc = (vocab.filter(F.length("w") <= _T21_MAX_WLEN)
           .crossJoin(F.broadcast(mdf))
           .select("w", F.length("w").alias("n_chars"),
                   F.size(F.filter(F.split(seg, _T21_SEP),
                                   lambda x: x != "")).alias("n_toks"))
           .unionByName(
               vocab.filter(F.length("w") > _T21_MAX_WLEN)
               .select("w", F.length("w").alias("n_chars"),
                       F.length("w").alias("n_toks"))))
    return (toks.join(enc, "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_chars").cast("long").alias("n_base_chars"),
                 F.sum("n_toks").cast("long").alias("n_tokens"))
            .select("doc_id", "n_words", "n_base_chars", "n_tokens",
                    det_round(F.col("n_base_chars").cast("double")
                              / F.col("n_tokens"), 5)
                    .alias("compression"))
            .orderBy("doc_id"))


_T21_DR6_SQL = "FLOOR(({}) * 1000000.0 + 0.5) / 1000000.0"


def _t21_parts() -> list[str]:
    """Chained-CTE replay of the exact trainer: unrolled DP (8
    position steps × 3 EM rounds), identical FLOOR comparison keys,
    identical seed/floor/prune tie-breaks. Returns the CTE list
    through `kept` (the final pruned vocabulary) so T21's final
    SELECT and T22's encode CTEs both build on it."""
    S = "chr(1)"
    K, P, W = _T21_ROUNDS, _T21_MAX_PLEN, _T21_MAX_WLEN
    dr6 = _T21_DR6_SQL
    parts = [f"""words AS MATERIALIZED (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> '' AND length(w) <= {W} GROUP BY w)""", f"""subs AS MATERIALIZED (
  SELECT piece, SUM(freq) AS cnt
  FROM (SELECT unnest(flatten(list_transform(range(1, {P + 1}),
               l -> list_transform(range(1, length(w) - l + 2),
                    i -> substr(w, i, l))))) AS piece, freq
        FROM words)
  GROUP BY piece)""", """chars AS MATERIALIZED (
  SELECT piece FROM subs WHERE length(piece) = 1)""", f"""u0 AS MATERIALIZED (
  SELECT piece, cnt FROM subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM subs WHERE length(piece) > 1)
  WHERE rk <= {_T21_SEED})"""]
    for r in range(K + 1):
        if r > 0:
            parts.append(f"""u{r} AS MATERIALIZED (
  SELECT piece, cnt FROM c{r}
  UNION ALL
  SELECT c.piece, CAST(1 AS BIGINT) AS cnt FROM chars c
  WHERE c.piece NOT IN (SELECT piece FROM c{r}))""")
        parts.append(f"""v{r} AS MATERIALIZED (
  SELECT piece,
         {dr6.format(f"ln(CAST(cnt AS DOUBLE)) - ln(t.T)")} AS score
  FROM u{r} CROSS JOIN
       (SELECT CAST(SUM(cnt) AS DOUBLE) AS T FROM u{r}) t)""")
        if r == K:
            break
        rr = r + 1
        parts.append(f"""b{rr}_0 AS (
  SELECT w, freq, CAST(0.0 AS DOUBLE) AS sc, '' AS seg FROM words)""")
        for j in range(1, W + 1):
            unions = "\n      UNION ALL\n".join(f"""      SELECT b.w, b.freq, b.sc + v.score AS sc,
             b.seg || {S} || substr(b.w, {j - l + 1}, {l}) AS seg
      FROM b{rr}_{j - l} b JOIN v{r} v
        ON v.piece = substr(b.w, {j - l + 1}, {l})
      WHERE length(b.w) >= {j}""" for l in range(1, min(P, j) + 1))
            parts.append(f"""b{rr}_{j} AS MATERIALIZED (
  SELECT w, freq, sc, seg FROM (
    SELECT w, freq, sc, seg, ROW_NUMBER() OVER (PARTITION BY w
           ORDER BY FLOOR(sc * 100000.0 + 0.5) DESC, seg) AS rk
    FROM (
{unions}
    ))
  WHERE rk = 1)""")
        segs = "\n  UNION ALL\n".join(
            f"  SELECT freq, seg FROM b{rr}_{j} WHERE length(w) = {j}"
            for j in range(1, W + 1))
        parts.append(f"""e{rr} AS MATERIALIZED (
{segs})""")
        parts.append(f"""c{rr} AS MATERIALIZED (
  SELECT piece, SUM(freq) AS cnt
  FROM (SELECT unnest(list_filter(string_split(seg, {S}),
               x -> x <> '')) AS piece, freq
        FROM e{rr})
  GROUP BY piece)""")
    parts.append(f"""kept AS (
  SELECT piece, cnt FROM u{K} WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM u{K} WHERE length(piece) > 1)
  WHERE rk <= {_T21_VOCAB})""")
    return parts


def _t21_sql() -> str:
    final = f"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank,
       piece, CAST(length(piece) AS INT) AS n_chars,
       CAST(cnt AS BIGINT) AS cnt,
       {_T21_DR6_SQL.format("ln(CAST(cnt AS DOUBLE)) - ln(t.T)")} AS logprob
FROM kept CROSS JOIN (SELECT CAST(SUM(cnt) AS DOUBLE) AS T FROM kept) t
ORDER BY rank"""
    return "WITH " + ",\n".join(_t21_parts()) + "\n" + final


def _t22_sql() -> str:
    """Oracle for the encode half: replay training (shared
    _t21_parts CTEs through `kept`), score the final vocabulary,
    Viterbi-decode every distinct corpus word ≤ _T21_MAX_WLEN with
    the same unrolled DP / FLOOR keys, char-fallback beyond, then
    join the corpus tokens back for per-doc stats."""
    S = "chr(1)"
    P, W = _T21_MAX_PLEN, _T21_MAX_WLEN
    parts = _t21_parts()
    parts.append(f"""vf AS MATERIALIZED (
  SELECT piece,
         {_T21_DR6_SQL.format("ln(CAST(cnt AS DOUBLE)) - ln(t.T)")} AS score
  FROM kept CROSS JOIN
       (SELECT CAST(SUM(cnt) AS DOUBLE) AS T FROM kept) t)""")
    parts.append("""ctoks AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents) WHERE w <> '')""")
    parts.append(f"""cw AS MATERIALIZED (
  SELECT DISTINCT w FROM ctoks WHERE length(w) <= {W})""")
    parts.append("""g0 AS (
  SELECT w, CAST(0.0 AS DOUBLE) AS sc, '' AS seg FROM cw)""")
    for j in range(1, W + 1):
        unions = "\n      UNION ALL\n".join(f"""      SELECT b.w, b.sc + v.score AS sc,
             b.seg || {S} || substr(b.w, {j - l + 1}, {l}) AS seg
      FROM g{j - l} b JOIN vf v
        ON v.piece = substr(b.w, {j - l + 1}, {l})
      WHERE length(b.w) >= {j}""" for l in range(1, min(P, j) + 1))
        parts.append(f"""g{j} AS MATERIALIZED (
  SELECT w, sc, seg FROM (
    SELECT w, sc, seg, ROW_NUMBER() OVER (PARTITION BY w
           ORDER BY FLOOR(sc * 100000.0 + 0.5) DESC, seg) AS rk
    FROM (
{unions}
    ))
  WHERE rk = 1)""")
    segs = "\n  UNION ALL\n".join(
        f"  SELECT w, seg FROM g{j} WHERE length(w) = {j}"
        for j in range(1, W + 1))
    parts.append(f"""encw AS MATERIALIZED (
  SELECT w, length(w) AS n_chars,
         len(list_filter(string_split(seg, {S}), x -> x <> '')) AS n_toks
  FROM (
{segs})
  UNION ALL
  SELECT w, length(w) AS n_chars, length(w) AS n_toks
  FROM (SELECT DISTINCT w FROM ctoks WHERE length(w) > {W}))""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_base_chars,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       FLOOR(CAST(CAST(SUM(n_chars) AS VARCHAR) AS DOUBLE)
             / SUM(n_toks) * 100000.0 + 0.5) / 100000.0 AS compression
FROM ctoks JOIN encw USING (w)
GROUP BY doc_id ORDER BY doc_id""")


_T21_SQL = _t21_sql()
_T22_SQL = _t22_sql()


# ---- T23/T24: fastText-style quality classifier, TRAIN then APPLY ----
# (Joulin et al. 2016, "Bag of Tricks for Efficient Text
# Classification"): linear classifier over hashing-trick bag-of-words
# buckets. T16 is the APPLY shape with a stand-in md5 weight layer;
# T23 TRAINS a real layer in-engine and T24 applies it — completing
# the train→apply pair the way T14→T15 and T21→T22 did for tokenizers.
#
# Labels are the GPT-3/CCNet weak-supervision recipe: the trusted
# reference domain (source = 'src0', T17's _T17_REF_SOURCE) is the
# positive class, the rest of the crawl is negative.
#
# The optimizer is ONE closed-form diagonal-Newton step of logistic
# regression from w = 0 (fastText's SGD is sequential, hence
# shuffle-order-dependent — unusable under the engine's exactness
# contract). At w = 0 every σ(w·x) is exactly 1/2, so
#   gradient   g_h = Σ_d c_dh (y_d − 1/2)        → 2g_h  integer
#   d.Hessian  H_hh = 1/4 Σ_d c_dh² + λ          → 4H_hh integer
#   w_h = g_h / H_hh = 2·(2g_h) / (4H_hh)
# Every aggregate is an INTEGER sum (exact, order-invariant); the one
# float op is the final division — identical IEEE in both engines —
# and the weight quantizes half-up onto T16's integer layer
# ([-_T16_WSCALE, _T16_WSCALE], so the trained table drops into the
# same apply plan). Scale: two map-side-combined aggregates
# ((doc_id,h) then (h)); the model is |buckets| ≤ 64 rows.
_T23_L2x4 = 4          # 4λ — ridge term keeping rare buckets tame


def _t23_per_doc(d: DataFrame) -> DataFrame:
    """The shared corpus pass: per-(doc, bucket) token counts with the
    weak label — the ONE expensive stage (explode + (doc_id, h)
    shuffle) of both the trainer and the apply."""
    toks = (d.select("doc_id",
                     (F.col("source") == F.lit(_T17_REF_SOURCE))
                     .cast("int").alias("y"),
                     F.explode(_tokens()).alias("w"))
            .filter(F.col("w") != ""))
    bucket = (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10)
              .cast("bigint") % _T16_DIM)
    return (toks.select("doc_id", "y", bucket.alias("h"))
            .groupBy("doc_id", "h")
            .agg(F.first("y").alias("y"),
                 F.count("*").cast("long").alias("c")))


def _t23_stats(per_doc: DataFrame) -> DataFrame:
    """Closed-form diagonal-Newton step from the per-doc counts; used
    verbatim by T23 (output) and T24 (weight layer) so the two can't
    drift."""
    stats = (per_doc.groupBy("h")
             .agg(F.sum(F.col("c") * (F.lit(2) * F.col("y") - F.lit(1)))
                  .cast("long").alias("g2"),
                  F.sum(F.col("c") * F.col("c"))
                  .cast("long").alias("css"),
                  F.count("*").cast("long").alias("n_docs"),
                  F.sum("c").cast("long").alias("n_tokens")))
    h4 = (F.col("css") + F.lit(_T23_L2x4)).cast("long")
    # 2.0e3 not 2000.0: a plain decimal literal parses as DECIMAL in
    # DuckDB and the ratio would width-size; scientific notation pins
    # DOUBLE in both engines (same-text-SQL rule)
    raw = F.lit(2.0) * float(_T16_WSCALE) * F.col("g2") / h4.cast("double")
    wt = F.least(F.greatest(F.floor(raw + F.lit(0.5)).cast("long"),
                            F.lit(-_T16_WSCALE)),
                 F.lit(_T16_WSCALE))
    return stats.select("h", "n_docs", "n_tokens", "g2",
                        h4.alias("h4"), wt.alias("wt"))


def t23_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return _t23_stats(_t23_per_doc(d)).orderBy("h")


_T23_SQL = f"""
WITH toks AS (
  SELECT doc_id, CASE WHEN source = '{_T17_REF_SOURCE}' THEN 1 ELSE 0 END AS y,
         w
  FROM (SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> ''),
per_doc AS (
  SELECT doc_id, MIN(y) AS y,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM} AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM}),
stats AS (
  SELECT h,
         CAST(SUM(c * (2 * y - 1)) AS BIGINT) AS g2,
         CAST(SUM(c * c) + {_T23_L2x4} AS BIGINT) AS h4,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM per_doc GROUP BY h)
SELECT h, n_docs, n_tokens, g2, h4,
       LEAST(GREATEST(
           CAST(FLOOR(2.0e0 * {_T16_WSCALE}.0e0 * g2 / CAST(h4 AS DOUBLE)
                      + 0.5e0) AS BIGINT),
           -{_T16_WSCALE}), {_T16_WSCALE}) AS wt
FROM stats ORDER BY h
"""


def t24_classifier_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with T23's trained layer and report the
    4-cell confusion matrix against the weak labels. The per-doc
    score Σ_h wt_h·c_dh is an integer dot product (exact in any
    shuffle order); the decision matches T16's kept = score > 0.
    Scale: train and apply share ONE corpus pass — the (doc_id, h)
    counts are scratch-persisted, the ≤64-row layer aggregates off
    the persisted counts (no second explode/shuffle) and broadcasts
    back onto them; the corpus then shuffles once on doc_id; output
    is the constant-size confusion matrix."""
    d = _t(spark, sf_dir, "documents")
    counts = scratch_persist(_t23_per_doc(d))
    wts = _t23_stats(counts).select("h", "wt")
    scored = (counts.join(F.broadcast(wts), "h")
              .groupBy("doc_id")
              .agg(F.first("y").alias("y"),
                   F.sum(F.col("c") * F.col("wt"))
                   .cast("long").alias("score"),
                   F.sum("c").cast("long").alias("n_tokens")))
    return (scored
            .groupBy((F.col("y") == 1).alias("label"),
                     (F.col("score") > 0).alias("predicted"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("sum_tokens"))
            .orderBy("label", "predicted"))


_T24_SQL = f"""
WITH toks AS (
  SELECT doc_id, source = '{_T17_REF_SOURCE}' AS label, w
  FROM (SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> ''),
counts AS (
  SELECT doc_id, MIN(CAST(label AS INT)) = 1 AS label,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM} AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM}),
train_doc AS (
  SELECT doc_id, MIN(y) AS y,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM} AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               CASE WHEN source = '{_T17_REF_SOURCE}' THEN 1 ELSE 0 END AS y,
               w
        FROM (SELECT doc_id, source,
                     unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE w <> '') GROUP BY doc_id,
         CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % {_T16_DIM}),
wts AS (
  SELECT h,
         LEAST(GREATEST(
             CAST(FLOOR(2.0e0 * {_T16_WSCALE}.0e0
                        * CAST(SUM(c * (2 * y - 1)) AS BIGINT)
                        / CAST(SUM(c * c) + {_T23_L2x4} AS DOUBLE)
                        + 0.5e0) AS BIGINT),
             -{_T16_WSCALE}), {_T16_WSCALE}) AS wt
  FROM train_doc GROUP BY h),
scored AS (
  SELECT doc_id, MIN(CAST(label AS INT)) = 1 AS label,
         CAST(SUM(c * wt) AS BIGINT) AS score,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM counts JOIN wts USING (h) GROUP BY doc_id)
SELECT label, score > 0 AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM scored GROUP BY label, score > 0
ORDER BY label, predicted
"""


# ---- T25: PMI collocation mining (Church & Hanks 1990) ---------------
_T25_MIN_C = 5     # bigram support floor — the published practice that
                   # tames PMI's low-count bias (a 1-occurrence pair of
                   # two hapaxes has maximal PMI and zero evidence)
_T25_K = 50


def t25_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation table: top-K adjacent word pairs by
    pointwise mutual information (Church & Hanks 1990) — the
    association mining every corpus-linguistics / phrase-vocabulary
    pipeline runs (word2vec's phrase pass is this scoring with a
    discount). PMI = ln p(a,b) − ln p(a) − ln p(b) with p(a,b) over
    the bigram stream and p(·) over the token stream, written as ONE
    fixed-shape expression over logs of exact integers
    (ln c − ln T_bi − ln c_a − ln c_b + 2·ln T_u), so both engines
    produce bit-identical doubles; ranking is on FLOOR(pmi·10⁶+.5)
    with (w1, w2) tiebreak — a total order.

    Scale: T9's bigram machinery (posexplode + per-doc lead — the
    corpus is doc_id-partitioned, the window needs no exchange); the
    bigram shuffle is ONE map-side-combined (w1, w2) aggregate with
    the support filter applied BEFORE the vocabulary joins (the ≥5
    floor drops the Zipf tail, which is most of the distinct mass);
    unigram counts are a second vocab-sized aggregate; the two
    totals ride a 1-row broadcast. The output is K rows at any
    corpus size."""
    from pyspark.sql.window import Window
    from ..runtime import scratch_persist
    d = _t(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.posexplode(_tokens()).alias("pos", "w"))
           .filter(F.col("w") != ""))
    wn = Window.partitionBy("doc_id").orderBy("pos")
    bg = (tok.select("doc_id", F.col("w").alias("w1"),
                     F.lead("w").over(wn).alias("w2"))
          .filter(F.col("w2").isNotNull()))
    uni = scratch_persist(
        tok.groupBy("w").agg(F.count("*").cast("long").alias("cu")))
    pdoc = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    tot = (pdoc.agg(F.sum("n").cast("long").alias("tu"),
                    F.count("*").cast("long").alias("dd")))
    big = (bg.groupBy("w1", "w2")
           .agg(F.count("*").cast("long").alias("c"))
           .filter(F.col("c") >= _T25_MIN_C))
    pmi = (F.log("c") - F.log(F.col("tu") - F.col("dd"))
           - F.log("cu1") - F.log("cu2")
           + F.lit(2.0) * F.log("tu"))
    scored = (big
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("cu").alias("cu1")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("cu").alias("cu2")), "w2")
              .crossJoin(F.broadcast(tot))    # 1-row totals scalar
              .withColumn("ak", F.floor(pmi * F.lit(1.0e6) + F.lit(0.5))
                          .cast("long")))
    return (scored.orderBy(F.desc("ak"), "w1", "w2").limit(_T25_K)
            .select("w1", "w2", "c", "cu1", "cu2",
                    (F.col("ak").cast("double") / F.lit(1.0e6))
                    .alias("pmi6")))


_T25_SQL = f"""
WITH tok AS (
  SELECT doc_id, pos, w FROM (
    SELECT doc_id, i AS pos, t[CAST(i AS INT) + 1] AS w
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
          FROM documents), UNNEST(range(len(t))) AS u(i))
  WHERE w <> ''),
bg AS (
  SELECT doc_id, w AS w1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok QUALIFY w2 IS NOT NULL),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM tok GROUP BY w),
pdoc AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tu,
               CAST(COUNT(*) AS BIGINT) AS dd FROM pdoc),
big AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= {_T25_MIN_C}),
scored AS (
  SELECT w1, w2, c, a.cu AS cu1, b.cu AS cu2,
         CAST(FLOOR((ln(c) - ln(tu - dd) - ln(a.cu) - ln(b.cu)
                     + 2.0e0 * ln(tu)) * 1.0e6 + 0.5e0) AS BIGINT)
           AS ak
  FROM big JOIN uni a ON w1 = a.w JOIN uni b ON w2 = b.w, tot)
SELECT w1, w2, c, cu1, cu2, CAST(ak AS DOUBLE) / 1.0e6 AS pmi6
FROM scored ORDER BY ak DESC, w1, w2 LIMIT {_T25_K}
"""


QUERIES = {
    "t25_pmi_collocations": t25_pmi_collocations,
    "t24_classifier_apply": t24_classifier_apply,
    "t23_classifier_train": t23_classifier_train,
    "t22_unigram_lm_encode": t22_unigram_lm_encode,
    "t21_unigram_lm_train": t21_unigram_lm_train,
    "t20_kneser_ney_logprob": t20_kneser_ney_logprob,
    "t19_source_kl_divergence": t19_source_kl_divergence,
    "t18_script_id": t18_script_id,
    "t17_perplexity_buckets": t17_perplexity_buckets,
    "t16_quality_classifier": t16_quality_classifier,
    "t15_bpe_encode": t15_bpe_encode,
    "t14_bpe_train": t14_bpe_train,
    "t1_language_id": t1_language_id,
    "t2_quality_score": t2_quality_score,
    "t3_token_count": t3_token_count,
    "t4_fingerprint": t4_fingerprint,
    "t5_filter_pipeline": t5_filter_pipeline,
    "t6_pii_redact": t6_pii_redact,
    "t7_repetition_stats": t7_repetition_stats,
    "t8_entropy_quality": t8_entropy_quality,
    "t9_bigram_logprob": t9_bigram_logprob,
    "t10_tfidf_keywords": t10_tfidf_keywords,
    "t11_bpe_pairs": t11_bpe_pairs,
    "t12_zipf_fit": t12_zipf_fit,
    "t13_context_chunks": t13_context_chunks,
}

ORACLE = {
    "t25_pmi_collocations": _T25_SQL,
    "t24_classifier_apply": _T24_SQL,
    "t23_classifier_train": _T23_SQL,
    "t22_unigram_lm_encode": _T22_SQL,
    "t21_unigram_lm_train": _T21_SQL,
    "t20_kneser_ney_logprob": _T20_SQL,
    "t19_source_kl_divergence": _T19_SQL,
    "t18_script_id": _T18_SQL,
    "t16_quality_classifier": _T16_SQL,
    "t17_perplexity_buckets": _T17_SQL,
    "t15_bpe_encode": _T15_SQL,
    "t14_bpe_train": _T14_SQL,
    "t1_language_id": _T1_SQL,
    "t2_quality_score": _T2_SQL,
    "t3_token_count": _T3_SQL,
    "t4_fingerprint": _T4_SQL,
    "t5_filter_pipeline": _T5_SQL,
    "t6_pii_redact": _T6_SQL,
    "t7_repetition_stats": _T7_SQL,
    "t8_entropy_quality": _T8_SQL,
    "t9_bigram_logprob": _T9_SQL,
    "t10_tfidf_keywords": _T10_SQL,
    "t11_bpe_pairs": _T11_SQL,
    "t12_zipf_fit": _T12_SQL,
    "t13_context_chunks": _T13_SQL,
}
