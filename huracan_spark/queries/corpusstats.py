"""Corpus-level statistical profiles over the ``documents`` table.

Three descriptive-statistics operators a training-data pipeline runs
before fixing a data mixture (beyond-reference extension per the build
brief; complements the per-document signals in ``queries/text.py``):

- ``zipf_rank_slope`` — OLS fit of ln(freq) on ln(rank) over the
  top-K token frequencies: the Zipf exponent, the one-number summary
  of vocabulary concentration (natural corpora ≈ -1; synthetic /
  template text deviates hard).  The vocab agg is corpus-linear; the
  rank window runs over the bounded top-K rows only (same discipline
  as ``vocab_topk``).
- ``lexical_diversity`` — per-source type-token ratio and hapax
  fraction (the lexical-richness audit that flags boilerplate-heavy
  sources).  One explode scan → (source, token) hash agg → per-source
  rollup; never a per-doc distinct over the corpus.
- ``tokenizer_fertility`` — per-language subword-per-word ratio of
  the BPE-ish regex tokenizer vs the whitespace tokenizer (the
  tokenizer-cost planning number: how many model tokens a word costs
  in each language).  Pure column expressions, one scan.

Shared tokenization comes from ``functions/textfns.py`` so the SQL
twins are generated from the same constants and can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.queries.registry import register
from huracan_spark.queries.text import _BPE_PATTERN, _BPE_SQL_PATTERN
from huracan_spark.functions.textfns import tokens, tokens_sql
from huracan_spark.sources.tables import load_table

ZIPF_TOP_K = 200


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- Zipf rank-frequency slope ----------------------------------------------

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest({tokens_sql('text')}) AS token FROM documents
),
freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
topk AS (SELECT token, n FROM freq ORDER BY n DESC, token LIMIT {ZIPF_TOP_K}),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS lx,
         ln(CAST(n AS DOUBLE)) AS ly
  FROM topk
),
m AS (
  SELECT count(*) AS k, avg(lx) AS mx, avg(ly) AS my,
         sum(lx * ly) AS sxy, sum(lx * lx) AS sxx, sum(ly * ly) AS syy
  FROM ranked
)
SELECT CAST(k AS BIGINT) AS k,
       round((sxy - k * mx * my) / (sxx - k * mx * mx), 6) AS slope,
       round(my - (sxy - k * mx * my) / (sxx - k * mx * mx) * mx, 6)
         AS intercept,
       round(pow(sxy - k * mx * my, 2)
             / ((sxx - k * mx * mx) * (syy - k * my * my)), 6) AS r2
FROM m
"""


@register(
    "zipf_rank_slope",
    _ZIPF_ORACLE,
    doc=f"Zipf exponent: OLS of ln(freq) on ln(rank) over the top-{ZIPF_TOP_K} "
    "token frequencies — vocab agg is corpus-linear, the rank window "
    "runs over the bounded top-K rows only (sort+limit = distributed "
    "TakeOrderedAndProject), closed-form moments, one output row",
)
def q_zipf_rank_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    freq = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    topk = freq.orderBy(F.col("n").desc(), "token").limit(ZIPF_TOP_K)
    # window over exactly ZIPF_TOP_K rows — bounded by construction
    w = Window.orderBy(F.col("n").desc(), "token")
    ranked = topk.select(
        F.log(F.row_number().over(w).cast("double")).alias("lx"),
        F.log(F.col("n").cast("double")).alias("ly"),
    )
    m = ranked.agg(
        F.count("*").alias("k"),
        F.avg("lx").alias("mx"),
        F.avg("ly").alias("my"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    cxy = F.col("sxy") - F.col("k") * F.col("mx") * F.col("my")
    cxx = F.col("sxx") - F.col("k") * F.col("mx") * F.col("mx")
    cyy = F.col("syy") - F.col("k") * F.col("my") * F.col("my")
    return m.select(
        F.col("k").cast("long").alias("k"),
        F.round(cxy / cxx, 6).alias("slope"),
        F.round(F.col("my") - (cxy / cxx) * F.col("mx"), 6).alias("intercept"),
        F.round(F.pow(cxy, 2) / (cxx * cyy), 6).alias("r2"),
    )


# -- per-source lexical diversity -------------------------------------------

_DIVERSITY_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({tokens_sql('text')}) AS token FROM documents
),
tf AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS type_token_ratio,
       round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_frac
FROM tf GROUP BY source
"""


@register(
    "lexical_diversity",
    _DIVERSITY_ORACLE,
    doc="per-source type-token ratio + hapax-legomenon fraction: one "
    "explode scan -> (source, token) hash agg -> per-source rollup; "
    "the boilerplate-vs-rich-text source audit, never a per-doc "
    "distinct over the corpus",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tf = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    return tf.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.round(F.count("*").cast("double") / F.sum("n"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum((F.col("n") == 1).cast("double")) / F.count("*"), 6
        ).alias("hapax_frac"),
    )


# -- per-language tokenizer fertility ---------------------------------------

_FERTILITY_ORACLE = f"""
WITH per_doc AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '{_BPE_SQL_PATTERN}'))
           AS n_subwords,
         len({tokens_sql('text')}) AS n_words
  FROM documents
)
SELECT lang,
       CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       round(CAST(sum(n_subwords) AS DOUBLE) / sum(n_words), 6)
         AS fertility
FROM per_doc GROUP BY lang
"""


@register(
    "tokenizer_fertility",
    _FERTILITY_ORACLE,
    doc="per-language fertility of the BPE-ish regex tokenizer (model "
    "subwords per whitespace word) — the tokenizer-cost planning "
    "number; pure column expressions, one scan, |langs|-bounded output",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    subs = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    per_doc = d.select(
        "lang",
        F.size(subs).alias("n_subwords"),
        F.size(tokens("text")).alias("n_words"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.round(
            F.sum("n_subwords").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
    )
