"""Text-analysis queries over ``documents`` (training-data pipeline ops).

Each query pairs the Spark plan with a DuckDB oracle generated from the
same constants (functions/textfns.py), so both engines compute the
same tokenization/scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions import textfns as X
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- token stats ------------------------------------------------------------

_TOKEN_ORACLE = f"""
SELECT doc_id,
       len({X.tokens_sql('text')}) AS n_tokens,
       strlen(text) AS n_bytes,
       round(CAST(strlen(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / len({X.tokens_sql('text')}), 6) AS avg_token_len
FROM documents
"""


@register("doc_token_stats", _TOKEN_ORACLE, doc="token counting (whitespace tokenizer)")
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = X.token_count("text")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.octet_length("text").alias("n_bytes"),
        F.round(
            F.octet_length(F.regexp_replace("text", r"\s+", "")) / n_tokens, 6
        ).alias("avg_token_len"),
    )


# -- quality scoring --------------------------------------------------------

_QUALITY_ORACLE = f"""
SELECT doc_id,
       {X.punct_ratio_sql('text')} AS punct_ratio,
       {X.stopword_ratio_sql('text')} AS stopword_ratio,
       round( least(1.0, len({X.tokens_sql('text')}) / 50.0) * 0.4
            + {X.stopword_ratio_sql('text')} * 0.4
            + (1.0 - {X.punct_ratio_sql('text')}) * 0.2, 6) AS quality_score
FROM documents
"""


@register(
    "doc_quality",
    _QUALITY_ORACLE,
    doc="quality scoring: length/punctuation/stopword signals",
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    punct = X.punct_ratio("text")
    stop = X.stopword_ratio("text")
    length_score = F.least(F.lit(1.0), X.token_count("text") / 50.0)
    return d.select(
        "doc_id",
        punct.alias("punct_ratio"),
        stop.alias("stopword_ratio"),
        F.round(length_score * 0.4 + stop * 0.4 + (1.0 - punct) * 0.2, 6).alias(
            "quality_score"
        ),
    )


# -- language id ------------------------------------------------------------

_LANGID_ORACLE = f"""
SELECT doc_id,
       {X.lang_score_sql('text', 'en')} AS score_en,
       {X.lang_score_sql('text', 'es')} AS score_es,
       {X.predicted_lang_sql('text')} AS predicted_lang
FROM documents
"""


@register(
    "doc_langid",
    _LANGID_ORACLE,
    doc="language-ID n-gram heuristic (marker-token argmax)",
)
def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    scores = X.lang_scores("text")
    return d.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["es"].alias("score_es"),
        X.predicted_lang("text").alias("predicted_lang"),
    )


# -- fingerprinting ---------------------------------------------------------

_FP_ORACLE = f"""
SELECT doc_id,
       {X.fingerprint_sql('text')} AS fingerprint,
       {X.hash60_sql('text', 'fp')} AS fingerprint60
FROM documents
"""


@register(
    "doc_fingerprint",
    _FP_ORACLE,
    doc="document fingerprinting: normalized md5 + 60-bit numeric hash",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        X.fingerprint("text").alias("fingerprint"),
        X.hash60(F.col("text"), "fp").alias("fingerprint60"),
    )


# -- BPE-ish regex tokenization (the second tokenizer the brief asks for) ---
#
# GPT-2-style pre-tokenization approximated with an RE2/Java-regex
# common subset: contraction suffixes, letter runs, digit runs, single
# non-space symbols.  Both engines extract non-overlapping matches
# left-to-right, so token streams are identical.

_BPE_PATTERN = r"'(?:s|t|re|ve|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_BPE_SQL_PATTERN = _BPE_PATTERN.replace("'", "''")  # escape for SQL literal

_BPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_BPE_SQL_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{_BPE_SQL_PATTERN}')))
         AS n_unique_bpe
FROM documents
"""


@register(
    "doc_bpe_tokens",
    _BPE_ORACLE,
    doc="BPE-ish regex tokenizer (GPT-2-style pre-tokenization subset): "
    "token + unique-token counts per document",
)
def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
    )


# -- rolling-hash fingerprint (char k-gram winnowing-style) -----------------
#
# The second fingerprint the brief asks for: position-independent
# content signatures from overlapping character k-grams, Rabin-Karp
# style.  Each k-gram is hashed (hash60); the document signature is
# the MINIMUM k-gram hash (1-permutation winnowing) plus the distinct
# k-gram count — robust to reordering/small edits in a way the
# whole-text md5 fingerprint is not.  All expressible as sequence +
# transform, no UDFs.

_KGRAM = 8

_STRIDE = 3  # strided gram sampling: 3x fewer hashes, still
# position-robust — the winnowing trade (sample density vs cost)

_ROLLING_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(text) - {_KGRAM} + 1, 0), {_STRIDE}),
                        i -> {X.hash60_sql(f'substr(text, i, {_KGRAM})', 'rh')}) AS hs
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(hs) = 0 THEN NULL ELSE list_min(hs) END AS min_gram_hash,
       len(list_distinct(hs)) AS n_distinct_grams
FROM grams
"""


@register(
    "doc_rolling_fingerprint",
    _ROLLING_ORACLE,
    doc=f"rolling-hash fingerprint: min {_KGRAM}-char-gram hash60 "
    "(winnowing-style) + distinct-gram count per document",
)
def q_doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_grams = F.length("text") - _KGRAM + 1
    # CASE guards the short-doc edge: Spark sequence(1, 0, step) throws
    # where DuckDB generate_series yields empty — branch lazily instead
    positions = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams, F.lit(_STRIDE))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    # substring(text, i, k) re-walks the string from byte 0 per
    # position (UTF8 codepoint counting) — O(len^2/stride) per doc in
    # theory, and the 10x rehearsal measures it ~1.2x over char-linear
    # at fixture doc lengths.  The asymptotically-clean alternative
    # (split('') once + O(k) array slices) was MEASURED 7x SLOWER at
    # both scales (nested non-codegen HOF eval per gram dwarfs the
    # byte-walk; see CLAUDE.md HOF gotcha) — keep substring; the
    # byte-walk constant only matters for books-length documents,
    # where chunking (doc_chunking) precedes fingerprinting anyway.
    grams = F.transform(
        positions,
        lambda i: X.hash60(F.substring(F.col("text"), i, F.lit(_KGRAM)), "rh"),
    )
    return (
        _docs(spark, sf_dir)
        .withColumn("_hs", grams)
        .select(
            "doc_id",
            F.array_min("_hs").alias("min_gram_hash"),
            F.size(F.array_distinct("_hs")).alias("n_distinct_grams"),
        )
    )


# -- repetition signals (Gopher-style quality rules) ------------------------
#
# Repetition is the strongest single signal for machine-generated /
# boilerplate text in LLM training corpora (Rae et al. 2021 "Scaling
# Language Models" §A.1.2 repetition rules, public).  Adapted to the
# corpus shape (single-line documents): token-level duplicate fraction
# and top word-2-gram mass.  Scale plan: explode -> two linear
# aggregations keyed by doc_id -- no self-joins, no quadratic blowup;
# per-doc stats carried through the grouping keys so the documents
# table is scanned ONCE.

_REP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {X.tokens_sql('text')} AS toks FROM documents
), base AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
           AS dup_token_frac,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigr
  FROM t
), cnt AS (
  SELECT doc_id, unnest(bigr) AS bigram FROM base
), bg AS (
  SELECT doc_id, bigram, count(*) AS c FROM cnt GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams FROM bg GROUP BY 1
)
SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
       round(coalesce(CAST(t2.top_cnt AS DOUBLE) / t2.n_bigrams, 0.0), 6)
         AS top_bigram_frac
FROM base b LEFT JOIN top t2 USING (doc_id)
"""


@register(
    "doc_repetition",
    _REP_ORACLE,
    doc="repetition quality signals: duplicate-token fraction + top "
    "word-2-gram mass per document (Gopher-rule analogs)",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir).select(
        "doc_id",
        X.tokens("text").alias("toks"),
    )
    base = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("toks")) / F.size("toks"), 6
        ).alias("dup_token_frac"),
        # sequence(1, 0) throws in Spark where DuckDB returns empty ->
        # CASE-guard short docs (CLAUDE.md invariant)
        F.when(
            F.size("toks") >= 2,
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            ),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
        .alias("bigr"),
    )
    # explode_outer keeps zero-bigram docs alive with a NULL marker row;
    # per-doc scalars ride the grouping keys so there is no join back
    # (single scan, two linear shuffles on doc_id)
    c_valid = F.when(F.col("bigram").isNotNull(), F.col("c")).otherwise(F.lit(0))
    return (
        base.select(
            "doc_id", "n_tokens", "dup_token_frac", F.explode_outer("bigr").alias("bigram")
        )
        .groupBy("doc_id", "n_tokens", "dup_token_frac", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tokens", "dup_token_frac")
        .agg(
            F.max(c_valid).alias("top_cnt"),
            F.sum(c_valid).alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.round(
                F.coalesce(F.col("top_cnt") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


# -- PII / URL scrubbing ----------------------------------------------------
#
# Standard pre-training scrub stage: detect-and-redact emails, URLs and
# IPv4 literals with a Java-regex/RE2 common-subset pattern set so both
# engines match identically.  Replacement order is fixed (URL first so
# an email inside a URL is not double-counted).  The fixture corpus is
# PII-free by construction (counts 0, text unchanged -- asserted by the
# oracle); behavior on text that DOES contain PII is pinned by
# tests/test_functions.py::test_pii_scrub_synthetic.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_IP = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"

_PII_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_URL}')) AS n_urls,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_IP}')) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_URL}', '<URL>', 'g'),
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}', '<IP>', 'g') AS redacted
FROM documents
"""


def pii_scrub(col) -> "F.Column":
    """Redact URLs, then emails, then IPv4 literals (fixed order)."""
    out = F.regexp_replace(col, _PII_URL, "<URL>")
    out = F.regexp_replace(out, _PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, _PII_IP, "<IP>")


@register(
    "doc_pii_scrub",
    _PII_ORACLE,
    doc="PII/URL scrub: count + redact emails, URLs, IPv4 literals "
    "(RE2/Java-regex common subset; order-pinned replacement)",
)
def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII_URL)).alias("n_urls"),
        F.regexp_count(t, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(_PII_IP)).alias("n_ips"),
        pii_scrub(t).alias("redacted"),
    )


# -- character-entropy quality signal ---------------------------------------
#
# Shannon entropy of the per-document character distribution — the
# classic gibberish/boilerplate detector (low entropy = repeated
# boilerplate, high = random noise; natural text sits in a band).
# Linear: explode chars -> two hash aggs keyed by doc_id; per-doc
# term count is bounded by the alphabet, so the entropy fold is a
# <=~100-term sum of exact-int-derived doubles — round(6) is far
# above fold-order ulp noise.

_ENTROPY_ORACLE = """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE length(text) >= 1
),
cc AS (
  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS ch, count(*) AS c
  FROM pos GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, CAST(sum(c) AS DOUBLE) AS l, count(*) AS n_distinct
  FROM cc GROUP BY 1
)
SELECT cc.doc_id,
       CAST(t.n_distinct AS BIGINT) AS n_distinct_chars,
       round(-sum((cc.c / t.l) * log2(cc.c / t.l)), 6) AS char_entropy
FROM cc JOIN tot t ON cc.doc_id = t.doc_id
GROUP BY cc.doc_id, t.n_distinct
"""


@register(
    "doc_char_entropy",
    _ENTROPY_ORACLE,
    doc="per-doc Shannon entropy of the character distribution "
    "(gibberish/boilerplate detector). Explode + two linear hash aggs "
    "keyed by doc_id — no join back to the corpus, no window",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.length("text") >= 1)
    # split('') yields the char array in ONE O(len) pass; the previous
    # explode(sequence)+substr(text, i, 1) formulation re-seeked the
    # UTF8 string from the start per position — O(len^2) per doc
    # (measured: 15.5x at the 10x scale rehearsal, where the synthetic
    # corpus also lengthens docs; linear now)
    cc = (
        d.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.length("ch") >= 1)
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    tot = cc.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("l"),
        F.count("*").alias("n_distinct_chars"),
    )
    p = F.col("c") / F.col("l")
    return (
        cc.join(tot, "doc_id")
        .groupBy("doc_id", "n_distinct_chars")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("char_entropy"))
        .select("doc_id", "n_distinct_chars", "char_entropy")
    )


# -- inverted index (capped postings) -----------------------------------------

# The search-engine primitive: token -> (document frequency, posting
# list).  Postings are CAPPED before collection — a per-token ranking
# window keeps the first K doc ids, so no executor ever materializes an
# unbounded list for a stop-word-grade token (the classic inverted-
# index OOM); the full df rides a separate count aggregate.

POSTINGS_CAP = 20

_INVINDEX_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({X.tokens_sql('text')}) AS token
  FROM documents
),
ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM tok
)
SELECT t.token,
       count(DISTINCT t.doc_id) AS df,
       string_agg(CASE WHEN r.rn <= {POSTINGS_CAP}
                       THEN CAST(r.doc_id AS VARCHAR) END, ','
                  ORDER BY r.doc_id) AS postings
FROM tok t JOIN ranked r ON t.token = r.token AND t.doc_id = r.doc_id
GROUP BY t.token
"""


@register(
    "inverted_index_sample",
    _INVINDEX_ORACLE,
    doc=f"inverted index with capped postings: token -> df + first "
    f"{POSTINGS_CAP} doc ids. The ranking window caps the list BEFORE "
    "collection so no executor materializes an unbounded posting for a "
    "hot token; df is a separate count over the full stream",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tok = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(X.tokens("text")).alias("token"))
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    ranked = tok.withColumn("rn", F.row_number().over(w))
    capped = ranked.filter(F.col("rn") <= POSTINGS_CAP)
    postings = capped.groupBy("token").agg(
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings")
    )
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    return df.join(postings, "token").select("token", "df", "postings")


# -- TF-IDF keyword extraction ------------------------------------------------

TFIDF_TOP = 3

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({X.tokens_sql('text')}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
idf AS (
  SELECT token, ln(CAST(n_docs.n AS DOUBLE) / count(DISTINCT doc_id)) AS idf
  FROM tok CROSS JOIN n_docs GROUP BY token, n_docs.n
),
scored AS (
  SELECT tf.doc_id, tf.token, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf ON tf.token = idf.token
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
SELECT doc_id, token, tfidf, rn AS rank
FROM ranked WHERE rn <= {TFIDF_TOP} AND tfidf > 0
"""


@register(
    "doc_tfidf_keywords",
    _TFIDF_ORACLE,
    doc=f"TF-IDF keyword extraction: top-{TFIDF_TOP} tokens per document "
    "by tf*ln(N/df). The idf table is vocabulary-sized (broadcast); the "
    "per-doc ranking window is bounded by document length",
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(X.tokens("text")).alias("token")
    )
    # ONE tokenize+explode pass: tf is unique per (doc, token), so both
    # aggregates below derive from it instead of re-scanning tok —
    # n_docs = distinct doc_id over tf (a doc has >=1 token iff it has
    # >=1 tf row) and df = plain count per token.  tf feeds three
    # consumers, two through broadcasts: materialize eagerly so the
    # broadcast threads read cache, not a re-run of the corpus explode.
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    tf.count()
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n"))
    idf = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token", F.log(F.col("n").cast("double") / F.col("df")).alias("idf")
        )
    )
    scored = tf.join(F.broadcast(idf), "token").select(
        "doc_id", "token", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= TFIDF_TOP) & (F.col("tfidf") > 0))
        .select("doc_id", "token", "tfidf", "rank")
    )


# -- language-ID confusion matrix ---------------------------------------------

_LANGCONF_ORACLE = f"""
SELECT lang AS true_lang,
       {X.predicted_lang_sql('text')} AS predicted_lang,
       count(*) AS n
FROM documents
GROUP BY 1, 2
"""


@register(
    "langid_confusion",
    _LANGCONF_ORACLE,
    doc="language-ID heuristic evaluation: confusion matrix of generator "
    "metadata lang vs the marker-token classifier (functions/textfns.py) "
    "— one scan, |langs|^2-bounded output",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import (
        LANG_MARKERS,
        lang_scores_from_tokens,
        predicted_from_scores,
    )

    # staged projections: tokenize ONCE into a column, score each
    # language over that column, then fold the argmax over the score
    # COLUMNS — predicted_lang inlined over text re-evaluates the
    # tokenizer per score and per argmax reference (filter/size are
    # CodegenFallback, no subexpression elimination).  The token array
    # and each score are multi-referenced non-cheap aliases, so
    # CollapseProject keeps the stage boundaries.
    t = _docs(spark, sf_dir).select("lang", X.tokens("text").alias("_toks"))
    scores = lang_scores_from_tokens(F.col("_toks"))
    scored = t.select(
        "lang", *[scores[lg].alias(f"_s_{lg}") for lg in LANG_MARKERS]
    )
    pred = predicted_from_scores(
        {lg: F.col(f"_s_{lg}") for lg in LANG_MARKERS}
    )
    return scored.groupBy(
        F.col("lang").alias("true_lang"),
        pred.alias("predicted_lang"),
    ).agg(F.count("*").alias("n"))


# -- language-ID confidence margin ------------------------------------------
#
# Quality refinement on the n-gram language classifier: how decisive
# was the argmax?  margin = best_score - runner_up_score (0 on ties
# and on unknown), rel_margin = margin / best.  Low-margin docs are
# the code-switched / ambiguous tail a mixture pipeline routes to a
# heavier classifier.  Pure column expressions from the SAME marker
# constants as doc_langid, so the twins can't drift.

from huracan_spark.functions.textfns import (  # noqa: E402
    LANG_MARKERS,
    lang_score_sql,
    lang_scores_from_tokens,
    predicted_from_scores,
    predicted_lang_sql,
    tokens,
)


_MARGIN_ORACLE_PARTS = {
    lang: lang_score_sql("text", lang) for lang in LANG_MARKERS
}
_MARGIN_BEST = "greatest(" + ", ".join(_MARGIN_ORACLE_PARTS.values()) + ")"
_MARGIN_PRED = predicted_lang_sql("text")
_MARGIN_SECOND = "greatest(" + ", ".join(
    f"CASE WHEN '{lang}' = {_MARGIN_PRED} THEN -1 ELSE {expr} END"
    for lang, expr in _MARGIN_ORACLE_PARTS.items()
) + ")"

_LANGID_MARGIN_ORACLE = f"""
SELECT doc_id,
       {_MARGIN_PRED} AS pred_lang,
       CAST({_MARGIN_BEST} AS BIGINT) AS best_score,
       CAST(CASE WHEN {_MARGIN_BEST} = 0 THEN 0
                 ELSE {_MARGIN_BEST} - {_MARGIN_SECOND} END AS BIGINT)
         AS margin,
       round(CASE WHEN {_MARGIN_BEST} = 0 THEN 0.0
                  ELSE CAST({_MARGIN_BEST} - {_MARGIN_SECOND} AS DOUBLE)
                       / {_MARGIN_BEST} END, 6) AS rel_margin
FROM documents
"""


@register(
    "doc_langid_margin",
    _LANGID_MARGIN_ORACLE,
    doc="language-ID decisiveness: best-vs-runner-up marker-score "
    "margin per doc (0 on ties/unknown) — routes the ambiguous tail "
    "to a heavier classifier; pure column expressions from the shared "
    "marker constants, one scan",
)
def q_doc_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged projections (same rationale as q_langid_confusion, and
    # worse here: the inlined `second` referenced the full `pred` tree
    # per language, compounding the tokenizer re-evaluation): tokenize
    # once -> score columns once -> argmax/margin over cheap column
    # references.  Each stage's aliases are multi-referenced non-cheap
    # expressions, so CollapseProject keeps the boundaries.
    t = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("_toks"))
    sc = lang_scores_from_tokens(F.col("_toks"))
    scored = t.select(
        "doc_id", *[sc[lg].alias(f"_s_{lg}") for lg in LANG_MARKERS]
    )
    cols = {lg: F.col(f"_s_{lg}") for lg in LANG_MARKERS}
    staged = scored.select(
        "doc_id",
        *[cols[lg].alias(f"_s_{lg}") for lg in LANG_MARKERS],
        F.greatest(*cols.values()).alias("_best"),
        predicted_from_scores(cols).alias("_pred"),
    )
    best, pred = F.col("_best"), F.col("_pred")
    second = F.greatest(
        *[
            F.when(F.lit(lg) == pred, F.lit(-1)).otherwise(cols[lg])
            for lg in LANG_MARKERS
        ]
    )
    margin = F.when(best == 0, F.lit(0)).otherwise(best - second)
    rel = F.when(best == 0, F.lit(0.0)).otherwise(
        margin.cast("double") / best
    )
    return staged.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.cast("long").alias("best_score"),
        margin.cast("long").alias("margin"),
        F.round(rel, 6).alias("rel_margin"),
    )
