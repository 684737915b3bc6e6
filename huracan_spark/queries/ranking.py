"""Full-text relevance ranking + Gopher-style quality rules.

BM25 is the retrieval primitive a training-data pipeline uses for
targeted corpus slicing ("pull everything relevant to these topics")
and for decontamination audits; the Gopher rules (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 — public paper) are the
standard repetition-independent quality filters alongside
queries/text.py's heuristics.

Scale shape (BM25): term statistics (df per query term, corpus size,
average doc length) are BOUNDED — |query terms| rows and three
scalars — so every join here is a broadcast; the corpus is scanned
once for tf and once for lengths, and only (doc x matched-term) rows
(<= |terms| per doc) ever aggregate.  Nothing corpus-sized shuffles
on a skewed key.

Gopher rules are pure column expressions — single scan, no shuffle at
all beyond the parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

# deterministic query: frequent fixture topics (same idea as a topic
# slice over a crawl; literals inlined into both engines)
BM25_TERMS = ("join", "vector", "filter")
BM25_K1 = 1.2
BM25_B = 0.75


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents
),
lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ({_TERMS_SQL}) GROUP BY doc_id, token
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT t.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
           * (t.tf * ({BM25_K1} + 1))
           / (t.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.dl / s.avgdl))
           AS part
  FROM tf t
  JOIN df d ON d.token = t.token
  JOIN lens l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(part), 6) AS bm25
FROM scored GROUP BY doc_id
"""


@register(
    "bm25_scores",
    _BM25_ORACLE,
    doc=f"BM25 (k1={BM25_K1}, b={BM25_B}) of the fixed query "
    f"{BM25_TERMS} over documents: df/avgdl stats are broadcast-sized "
    "by construction, corpus scans are linear",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    lens = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    part = idf * (F.col("tf") * (BM25_K1 + 1)) / denom
    return (
        tf.join(F.broadcast(df), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(part), 6).alias("bm25"))
    )


# -- Gopher-style quality rules ---------------------------------------------

MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_FRAC = 0.8
MAX_SYMBOL_WORD_RATIO = 0.1

_GOPHER_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         len({tokens_sql('text')}) AS n_words,
         round(CAST(len(regexp_replace(replace(text, ' ', ''), '\\s', '', 'g'))
               AS DOUBLE) / len({tokens_sql('text')}), 6) AS mean_word_len,
         round(CAST(len(list_filter({tokens_sql('text')},
                     w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
               / len({tokens_sql('text')}), 6) AS alpha_word_frac,
         round(CAST(len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               AS DOUBLE) / len({tokens_sql('text')}), 6) AS symbol_word_ratio
  FROM documents
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_word_ratio,
       (mean_word_len >= {MIN_MEAN_WORD_LEN}
        AND mean_word_len <= {MAX_MEAN_WORD_LEN}
        AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
        AND symbol_word_ratio <= {MAX_SYMBOL_WORD_RATIO}) AS passes_gopher
FROM g
"""


@register(
    "gopher_quality_rules",
    _GOPHER_ORACLE,
    doc="Gopher-style quality gates (mean word length, alphabetic-word "
    "fraction, symbol-to-word ratio) — single scan, pure column exprs",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tokens("text")
    n_words = F.size(t)
    # mean word length over the non-whitespace mass, exactly as the
    # oracle computes it (total non-space chars / word count)
    nonspace = F.length(F.regexp_replace(F.regexp_replace("text", " ", ""), r"\s", ""))
    mean_word_len = F.round(nonspace.cast("double") / n_words, 6)
    alpha_word_frac = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).cast("double") / n_words,
        6,
    )
    symbol_word_ratio = F.round(
        F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
        / n_words,
        6,
    )
    g = _docs(spark, sf_dir).select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_word_frac.alias("alpha_word_frac"),
        symbol_word_ratio.alias("symbol_word_ratio"),
    )
    passes = (
        (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
        & (F.col("symbol_word_ratio") <= MAX_SYMBOL_WORD_RATIO)
    )
    return g.withColumn("passes_gopher", passes)


# -- PMI collocations -------------------------------------------------------
#
# Pointwise mutual information over token bigrams: the standard
# collocation detector (phrase mining for tokenizer/vocab decisions —
# "new york" should be one unit).  Scale shape: unigram and bigram
# count tables are token-type-sized aggregations of one corpus scan
# each; the PMI join keys on single tokens against the (bounded,
# broadcastable) unigram table — no corpus-sized shuffle on text.

PMI_MIN_COUNT = 30  # ignore rare bigrams (PMI is noise below this)
PMI_TOP = 100

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM documents
),
uni AS (
  SELECT u.token, count(*) AS cnt
  FROM (SELECT unnest(t) AS token FROM tok) u GROUP BY u.token
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM uni),
bi AS (
  SELECT w1, w2, count(*) AS cnt FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM tok, unnest(generate_series(1, len(t) - 1)) u(i)
    WHERE len(t) >= 2
  ) GROUP BY w1, w2
),
btot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nb FROM bi),
pmi AS (
  SELECT b.w1, b.w2, b.cnt,
         round(ln((CAST(b.cnt AS DOUBLE) / bt.nb)
               / ((CAST(u1.cnt AS DOUBLE) / t.n)
                  * (CAST(u2.cnt AS DOUBLE) / t.n))), 6) AS pmi
  FROM bi b
  JOIN uni u1 ON u1.token = b.w1
  JOIN uni u2 ON u2.token = b.w2
  CROSS JOIN tot t CROSS JOIN btot bt
  WHERE b.cnt >= {PMI_MIN_COUNT}
)
SELECT w1, w2, cnt, pmi FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn FROM pmi
) WHERE rn <= {PMI_TOP}
"""


@register(
    "bigram_pmi",
    _PMI_ORACLE,
    doc=f"top-{PMI_TOP} bigram collocations by PMI (count >= "
    f"{PMI_MIN_COUNT}): token-type-sized stats, no corpus shuffle",
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    tok = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("t"))
    uni = (
        tok.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .persist()  # token-type-sized (bounded), read by tot + 2 joins
    )
    tot = uni.agg(F.sum("cnt").alias("n"))
    pairs = tok.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("p")
    )
    bi = (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= PMI_MIN_COUNT)
    )
    btot_src = (
        tok.filter(F.size("t") >= 2)
        .select((F.size("t") - 1).alias("k"))
        .agg(F.sum("k").alias("nb"))
    )
    u1 = uni.select(F.col("token").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("cnt").cast("double") / F.col("nb"))
            / (
                (F.col("c1").cast("double") / F.col("n"))
                * (F.col("c2").cast("double") / F.col("n"))
            )
        ),
        6,
    )
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot_src))
        .select("w1", "w2", "cnt", pmi.alias("pmi"))
    )
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(PMI_TOP)
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return top.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= PMI_TOP
    ).select("w1", "w2", "cnt", "pmi")
