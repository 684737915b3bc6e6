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
