"""Data-curation scoring operators: DSIR importance, bigram LM, novelty.

Three published-technique curation signals an LLM data pipeline runs
between cleaning and sampling (beyond-reference extension per the
build brief):

- ``dsir_importance`` — Data Selection with Importance Resampling
  (Xie et al. 2023): per-document importance weight
  ``mean(log p_target(feature) / p_corpus(feature))`` over hashed
  token features.  The feature space is a fixed 256 buckets, so both
  distribution tables are bounded broadcasts; the corpus token stream
  is touched once and never shuffles on the token key.
- ``bigram_logprob`` — bigram-LM document scoring with add-0.5
  smoothing (the next step up from the unigram gate in
  ``queries/lmdata.py``).  The bigram/context count tables are bounded
  by the token type space (Zipf-capped in practice), broadcast onto
  the per-document bigram stream.
- ``ngram_novelty`` — fraction of a document's distinct word 3-grams
  that occur in no other document (the uniqueness/creativity signal;
  the complement of the boilerplate fraction in
  ``queries/dedup.py::substring_dup_blocks``).  One explode + df
  aggregate + equi-join back on the gram key.

All pure column expressions with oracle twins from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import hash60, hash60_sql, tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

DSIR_BUCKETS = 256  # hashed feature space (fixed => bounded stats tables)
DSIR_TARGET_LANG = "en"  # target distribution: English subcorpus

BIGRAM_SMOOTH = 0.5  # add-k smoothing for the bigram LM

NOVELTY_N = 3  # word n-gram order for the novelty signal


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- DSIR importance weights -------------------------------------------------

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         {hash60_sql('t.token', 'dsir')} % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, lang, unnest({tokens_sql('text')}) AS token
    FROM documents
  ) t
),
stats AS (
  SELECT b,
         count(*) AS n_all,
         count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS n_tgt
  FROM tok GROUP BY b
),
totals AS (
  SELECT CAST(sum(n_all) AS BIGINT) AS tot_all,
         CAST(sum(n_tgt) AS BIGINT) AS tot_tgt
  FROM stats
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(log10(
         ((coalesce(s.n_tgt, 0) + 1.0) / (totals.tot_tgt + {DSIR_BUCKETS}))
         / ((coalesce(s.n_all, 0) + 1.0) / (totals.tot_all + {DSIR_BUCKETS}))
       )), 4) AS dsir_weight
FROM tok t LEFT JOIN stats s ON t.b = s.b CROSS JOIN totals
GROUP BY t.doc_id
"""


@register(
    "dsir_importance",
    _DSIR_ORACLE,
    doc=f"DSIR importance weight per document: mean log-ratio of the "
    f"target ({DSIR_TARGET_LANG}) vs corpus distribution over "
    f"{DSIR_BUCKETS} hashed token features (Xie et al. 2023, reduced to "
    "its deterministic hashed-unigram form). Both distribution tables "
    "are bucket-bounded broadcasts; the token stream aggregates per doc "
    "with map-side combine and never shuffles on the token key",
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(tokens("text")).alias("token")
    ).select(
        "doc_id",
        "lang",
        (hash60(F.col("token"), "dsir") % DSIR_BUCKETS).alias("b"),
    )
    # stats is DSIR_BUCKETS-bounded: persist it eagerly so totals and
    # the broadcast build read the cached table instead of each
    # re-running the corpus tokenize pass (3 passes -> the inherent 2:
    # one to build the distributions, one to score)
    stats = tok.groupBy("b").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("n_tgt"),
    ).persist()
    stats.count()
    totals = stats.agg(
        F.sum("n_all").cast("long").alias("tot_all"),
        F.sum("n_tgt").cast("long").alias("tot_tgt"),
    )
    p_tgt = (F.coalesce(F.col("n_tgt"), F.lit(0)) + 1.0) / (
        F.col("tot_tgt") + DSIR_BUCKETS
    )
    p_all = (F.coalesce(F.col("n_all"), F.lit(0)) + 1.0) / (
        F.col("tot_all") + DSIR_BUCKETS
    )
    return (
        tok.join(F.broadcast(stats), "b", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log10(p_tgt / p_all)), 4).alias("dsir_weight"),
        )
    )


# -- bigram-LM document scoring ----------------------------------------------

_BIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('text')} AS ts FROM documents
),
bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
    FROM tok WHERE len(ts) >= 2
  )
),
pair_counts AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx_counts AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
               FROM pair_counts GROUP BY w1),
vocab AS (SELECT count(DISTINCT w2) AS v FROM bg)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(log10(
         (p.c12 + {BIGRAM_SMOOTH}) / (c.c1 + {BIGRAM_SMOOTH} * vocab.v)
       )), 4) AS avg_logprob
FROM bg b
JOIN pair_counts p ON b.w1 = p.w1 AND b.w2 = p.w2
JOIN ctx_counts c ON b.w1 = c.w1
CROSS JOIN vocab
GROUP BY b.doc_id
"""


@register(
    "bigram_logprob",
    _BIGRAM_ORACLE,
    doc=f"bigram-LM document scoring with add-{BIGRAM_SMOOTH} smoothing "
    "(the conditional-probability step up from the unigram gate). The "
    "bigram and context count tables are bounded by the token type "
    "space, broadcast onto the per-doc bigram stream — the corpus "
    "never shuffles on the skewed pair key",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("ts")).filter(
        F.size("ts") >= 2
    )
    bg = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("ts") - 1)).alias("i"),
        "ts",
    ).select(
        "doc_id",
        F.expr("element_at(ts, i)").alias("w1"),
        F.expr("element_at(ts, i + 1)").alias("w2"),
    )
    # pair_counts is type-bounded: persist it eagerly so ctx_counts,
    # vocab and the broadcast build read the cached table — the lazy
    # shape re-ran the corpus tokenize+explode FOUR times (pair/ctx/
    # vocab branches + final scan), with two broadcast threads racing
    # the fill.  vocab derives from pair_counts (every w2 occurs in
    # some pair), identical to count(DISTINCT w2) over bg.
    pair_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).persist()
    pair_counts.count()
    ctx_counts = pair_counts.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1")
    )
    vocab = pair_counts.agg(F.countDistinct("w2").alias("v"))
    lp = F.log10(
        (F.col("c12") + BIGRAM_SMOOTH) / (F.col("c1") + BIGRAM_SMOOTH * F.col("v"))
    )
    return (
        bg.join(F.broadcast(pair_counts), ["w1", "w2"])
        .join(F.broadcast(ctx_counts), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )


# -- n-gram novelty -----------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('text')} AS ts FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS gram
  FROM (
    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - {NOVELTY_N - 1})) AS i
    FROM tok WHERE len(ts) >= {NOVELTY_N}
  )
),
df AS (SELECT gram, count(*) AS n_docs FROM grams GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_grams,
       count(*) FILTER (WHERE df.n_docs = 1) AS n_novel,
       round(CAST(count(*) FILTER (WHERE df.n_docs = 1) AS DOUBLE)
             / count(*), 6) AS novelty
FROM grams g JOIN df ON g.gram = df.gram
GROUP BY g.doc_id
"""


@register(
    "ngram_novelty",
    _NOVELTY_ORACLE,
    doc=f"per-document novelty: fraction of distinct word {NOVELTY_N}-grams "
    "occurring in no other document (the uniqueness signal, complement "
    "of shared-boilerplate detection). One explode + document-frequency "
    "aggregate + equi-join back on the gram key — all shuffles are "
    "hash-partitioned on the gram, no self-join of the corpus",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("ts")).filter(
        F.size("ts") >= NOVELTY_N
    )
    gram = F.concat_ws(
        " ",
        F.expr("element_at(ts, i)"),
        F.expr("element_at(ts, i + 1)"),
        F.expr("element_at(ts, i + 2)"),
    )
    grams = (
        tok.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("ts") - (NOVELTY_N - 1))
            ).alias("i"),
            "ts",
        )
        .select("doc_id", gram.alias("gram"))
        .distinct()
        .persist()
    )
    # eager: grams feeds both the document-frequency aggregate and the
    # join-back scan — one tokenize+explode+distinct pass, not two
    grams.count()
    df = grams.groupBy("gram").agg(F.count("*").alias("n_docs"))
    novel = F.count(F.when(F.col("n_docs") == 1, 1))
    return (
        grams.join(df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
        )
    )


# -- typo pairs via deletion neighborhoods (FastSS) ---------------------------

# Edit-distance<=2 similarity JOIN made scale-safe: two strings within
# k edits share a member of their k-deletion neighborhoods (Bocek et
# al. 2007, FastSS), so candidates come from a plain equi-join on the
# deletion-variant key — fan-out 1 + L + C(L,2) per token, bounded by
# token length^2, never a quadratic levenshtein cross-join of the
# vocabulary.  The exact distance check runs on candidates only.

TYPO_MIN_LEN = 3
TYPO_MAX_DIST = 2

_TYPO_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT unnest({tokens_sql('text')}) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE length(token) >= {TYPO_MIN_LEN}),
del1 AS (
  SELECT token, substr(token, 1, i - 1) || substr(token, i + 1) AS v, i
  FROM (SELECT token, unnest(generate_series(1, length(token))) AS i FROM t)
),
del2 AS (
  -- delete position j > i of the original = delete (j-1) of the del1 string
  SELECT token, substr(v, 1, j - 2) || substr(v, j) AS v
  FROM (SELECT token, v, i, unnest(generate_series(i + 1, length(v) + 1)) AS j
        FROM del1)
),
variants AS (
  SELECT token, token AS variant FROM t
  UNION ALL SELECT token, v FROM del1
  UNION ALL SELECT token, v FROM del2
),
cand AS (
  SELECT DISTINCT a.token AS token_a, b.token AS token_b
  FROM variants a JOIN variants b
    ON a.variant = b.variant AND a.token < b.token
)
SELECT token_a, token_b,
       levenshtein(token_a, token_b) AS dist
FROM cand
WHERE levenshtein(token_a, token_b) <= {TYPO_MAX_DIST}
"""


@register(
    "token_typo_pairs",
    _TYPO_ORACLE,
    doc=f"edit-distance<={TYPO_MAX_DIST} token pairs via FastSS "
    "deletion neighborhoods: candidates share a <=2-deletion variant "
    "(plain equi-join on the variant key, fan-out bounded by token "
    "length^2), exact levenshtein verifies candidates only — never a "
    "quadratic cross-join of the vocabulary",
)
def q_token_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(tokens("text")).alias("token"))
        .distinct()
        .filter(F.length("token") >= TYPO_MIN_LEN)
    )
    del1 = (
        "transform(sequence(1, length(token)), "
        "i -> concat(substring(token, 1, i - 1), "
        "substring(token, i + 1, length(token))))"
    )
    # deleting original positions (i, j), i<j == deleting j, then i: do
    # both deletions on the fly from the original string
    del2 = (
        "flatten(transform(sequence(1, length(token)), "
        "j -> transform(sequence(1, j - 1), "
        "i -> concat(substring(token, 1, i - 1), "
        "substring(token, i + 1, j - i - 1), "
        "substring(token, j + 1, length(token))))))"
    )
    variants = toks.select(
        "token",
        F.explode(
            F.concat(F.array(F.col("token")), F.expr(del1), F.expr(del2))
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .select(
            F.col("a.token").alias("token_a"), F.col("b.token").alias("token_b")
        )
        .distinct()
    )
    dist = F.levenshtein("token_a", "token_b")
    return cand.filter(dist <= TYPO_MAX_DIST).select(
        "token_a", "token_b", dist.alias("dist")
    )


# -- distributed quality-classifier training (logistic regression) ----------
#
# The fastText/quality-filter training step of an LLM data pipeline
# (Brown et al. 2020 trained an LR quality filter over Common Crawl;
# beyond-reference extension per the build brief), expressed the way it
# must run at 100 TB: full-batch gradient descent where EVERY step is
# one scan over the (tiny, persisted) feature table + a d-term partial
# aggregate; the d=4 weight vector is the only driver-side state.  No
# per-row Python, no shuffle — the gradient is a map-side fold.
#
# Weak label: lang == 'en' (the surface-feature language signal the
# langid queries measure from the other direction).  Determinism across
# engines: gradient averages are folded in different orders (ulp-level
# drift), so each step's weights round to 9 decimals on BOTH engines
# before feeding the next step — the trajectories stay bit-identical.

LOGREG_LR = 0.5  # learning rate
LOGREG_STEPS = 3  # unrolled in the oracle as CTE levels


def _round_half_up(x: float, places: int) -> float:
    """DuckDB/Spark ROUND semantics (half away from zero) — python's
    builtin round() is banker's and would diverge on exact midpoints."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ln = F.length("text").cast("double")
    return docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("f0"),
        (F.log(F.lit(1.0) + ln) / 10.0).alias("f1"),
        ((ln - F.length(F.regexp_replace("text", " ", "")).cast("double")) / ln).alias("f2"),
        (
            (ln - F.length(F.regexp_replace("text", "[0-9]", "")).cast("double"))
            / ln
        ).alias("f3"),
    )


_LOGREG_FEATURES_SQL = """
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS f0,
         ln(1.0 + CAST(length(text) AS DOUBLE)) / 10.0 AS f1,
         CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
           / length(text) AS f2,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / length(text) AS f3
  FROM documents
"""

# each CTE level: p at the previous weights -> loss (pre-step) and the
# 9-rounded post-step weights, exactly the python driver loop
_LOGREG_ORACLE = f"""
WITH f AS ({_LOGREG_FEATURES_SQL}),
s1 AS (
  SELECT round(0.0 - {LOGREG_LR} * avg((0.5 - y) * f0), 9) AS w0,
         round(0.0 - {LOGREG_LR} * avg((0.5 - y) * f1), 9) AS w1,
         round(0.0 - {LOGREG_LR} * avg((0.5 - y) * f2), 9) AS w2,
         round(0.0 - {LOGREG_LR} * avg((0.5 - y) * f3), 9) AS w3,
         round(avg(-(y * ln(0.5) + (1.0 - y) * ln(0.5))), 6) AS loss
  FROM f
),
p2 AS (
  SELECT f.*, s1.w0 AS v0, s1.w1 AS v1, s1.w2 AS v2, s1.w3 AS v3,
         1.0 / (1.0 + exp(-(s1.w0 * f0 + s1.w1 * f1 + s1.w2 * f2 + s1.w3 * f3))) AS p
  FROM f, s1
),
s2 AS (
  SELECT round(any_value(v0) - {LOGREG_LR} * avg((p - y) * f0), 9) AS w0,
         round(any_value(v1) - {LOGREG_LR} * avg((p - y) * f1), 9) AS w1,
         round(any_value(v2) - {LOGREG_LR} * avg((p - y) * f2), 9) AS w2,
         round(any_value(v3) - {LOGREG_LR} * avg((p - y) * f3), 9) AS w3,
         round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS loss
  FROM p2
),
p3 AS (
  SELECT f.*, s2.w0 AS v0, s2.w1 AS v1, s2.w2 AS v2, s2.w3 AS v3,
         1.0 / (1.0 + exp(-(s2.w0 * f0 + s2.w1 * f1 + s2.w2 * f2 + s2.w3 * f3))) AS p
  FROM f, s2
),
s3 AS (
  SELECT round(any_value(v0) - {LOGREG_LR} * avg((p - y) * f0), 9) AS w0,
         round(any_value(v1) - {LOGREG_LR} * avg((p - y) * f1), 9) AS w1,
         round(any_value(v2) - {LOGREG_LR} * avg((p - y) * f2), 9) AS w2,
         round(any_value(v3) - {LOGREG_LR} * avg((p - y) * f3), 9) AS w3,
         round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS loss
  FROM p3
)
SELECT 1 AS step, round(w0, 6) AS w_bias, round(w1, 6) AS w_loglen,
       round(w2, 6) AS w_space, round(w3, 6) AS w_digit, loss FROM s1
UNION ALL
SELECT 2, round(w0, 6), round(w1, 6), round(w2, 6), round(w3, 6), loss FROM s2
UNION ALL
SELECT 3, round(w0, 6), round(w1, 6), round(w2, 6), round(w3, 6), loss FROM s3
"""


@register(
    "quality_logreg_train",
    _LOGREG_ORACLE,
    doc="distributed logistic-regression quality-classifier training "
    "(3 full-batch GD steps on surface features, weak label lang=en): "
    "each step is one scan + a 4-term partial aggregate; the weight "
    "vector is the only driver state.  Oracle unrolls the steps as "
    "CTE levels with the identical per-step 9-decimal weight rounding",
)
def q_quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _logreg_features(spark, sf_dir).persist()
    w = [0.0, 0.0, 0.0, 0.0]
    lr = LOGREG_LR
    out_rows = []
    try:
        for step in range(1, LOGREG_STEPS + 1):
            margin = sum(F.lit(w[j]) * F.col(f"f{j}") for j in range(4))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            agg = feats.agg(
                *[
                    F.avg((p - F.col("y")) * F.col(f"f{j}")).alias(f"g{j}")
                    for j in range(4)
                ],
                F.avg(
                    -(
                        F.col("y") * F.log(p)
                        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
                    )
                ).alias("loss"),
            ).first()
            w = [
                _round_half_up(w[j] - lr * agg[f"g{j}"], 9) for j in range(4)
            ]
            out_rows.append(
                (
                    step,
                    _round_half_up(w[0], 6),
                    _round_half_up(w[1], 6),
                    _round_half_up(w[2], 6),
                    _round_half_up(w[3], 6),
                    _round_half_up(agg["loss"], 6),
                )
            )
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        out_rows,
        "step int, w_bias double, w_loglen double, w_space double, "
        "w_digit double, loss double",
    )
