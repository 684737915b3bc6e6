"""Training-data-preparation queries over ``documents`` / ``events``.

The operations a large-scale LLM training-data pipeline runs after
dedup/quality (queries/dedup.py, queries/text.py): chunking documents
into fixed token windows, vocabulary building, deterministic
train/val/test splits, benchmark-contamination checks, unigram
language-model scoring, multi-granularity time rollups, incremental
(cross-snapshot) dedup, and per-group deterministic sampling.

Scale notes (100 TB):
- Every query is a declarative DataFrame plan — no UDFs, no collect.
- The contamination check semi-joins against the benchmark shingle
  set, which is small by definition (benchmarks are KBs, corpora are
  TBs) -> broadcast; the corpus side never shuffles doc-to-doc.
- The unigram LM restricts its vocabulary to a fixed top-K by design
  (OOV floor probability), so the scoring join is bounded-broadcast
  regardless of corpus size — the classic way to avoid a shuffle on
  a Zipf-skewed token key.
- Chunking / sampling / splits are embarrassingly parallel: pure
  per-row expressions or per-group windows over the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import (
    hash60,
    hash60_sql,
    punct_ratio_sql,
    stopword_ratio_sql,
    tokens,
    tokens_sql,
)
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

CHUNK_TOKENS = 64
VOCAB_TOPK = 200
LM_VOCAB_K = 1000
SAMPLE_PER_GROUP = 20
CONTAM_NGRAM = 5
BENCH_MOD = 50  # doc_id % BENCH_MOD == 0 -> benchmark member


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- fixed-size token chunking ----------------------------------------------

_CHUNK_ORACLE = f"""
WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
SELECT doc_id, i AS chunk_id,
       least({CHUNK_TOKENS}, len(toks) - i * {CHUNK_TOKENS}) AS n_tokens,
       array_to_string(toks[(i * {CHUNK_TOKENS} + 1):((i + 1) * {CHUNK_TOKENS})], ' ')
         AS chunk_text
FROM t, unnest(generate_series(0,
       CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) u(i)
"""


@register(
    "doc_chunking",
    _CHUNK_ORACLE,
    doc=f"split each document into {CHUNK_TOKENS}-token training chunks "
    "(sequence+explode; per-row, shuffle-free)",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("_toks", tokens("text"))
    n = F.size("_toks")
    # split(trim(x)) always yields >=1 element, so the sequence upper
    # bound is >=0 — no empty-sequence guard needed (CLAUDE.md gotcha:
    # Spark sequence(1,0,step) throws where DuckDB returns empty).
    n_chunks = F.ceil(n / F.lit(float(CHUNK_TOKENS))).cast("long")
    start = F.col("chunk_id") * CHUNK_TOKENS + 1
    return (
        d.select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.size("_toks") - F.col("chunk_id") * CHUNK_TOKENS,
            ).alias("n_tokens"),
            F.array_join(F.slice("_toks", start, CHUNK_TOKENS), " ").alias(
                "chunk_text"
            ),
        )
    )


# -- vocabulary building ----------------------------------------------------

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT unnest({tokens_sql('text')}) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token
)
SELECT token, cnt, rank FROM (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rank
  FROM counts
) WHERE rank <= {VOCAB_TOPK}
"""


@register(
    "vocab_topk",
    _VOCAB_ORACLE,
    doc=f"vocabulary build: top-{VOCAB_TOPK} tokens by frequency "
    "(map-side partial count, deterministic (cnt, token) tie-break)",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    counts = (
        d.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    # orderBy().limit(K) compiles to TakeOrderedAndProject — a
    # DISTRIBUTED top-K (per-partition heaps, driver merge of K rows) —
    # so the global row_number window only ever sees K rows.  A bare
    # row_number over the full counts table would funnel the whole
    # vocabulary through one partition.
    return _ranked_topk(counts)


def _ranked_topk(counts: DataFrame, k: int = VOCAB_TOPK) -> DataFrame:
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(k)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "cnt", "rank"
    )


# -- deterministic train/val/test split -------------------------------------

_SPLIT_CASE = f"""CASE
  WHEN {hash60_sql("doc_id::VARCHAR", "split")} % 100 < 80 THEN 'train'
  WHEN {hash60_sql("doc_id::VARCHAR", "split")} % 100 < 90 THEN 'val'
  ELSE 'test' END"""

_SPLIT_ORACLE = f"""
SELECT source, {_SPLIT_CASE} AS split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY source, split
"""


@register(
    "hash_split",
    _SPLIT_ORACLE,
    doc="deterministic 80/10/10 train/val/test assignment by content-stable "
    "hash of doc_id — reproducible across engines/runs, no RNG state",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    h = hash60(F.col("doc_id").cast("string"), "split") % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )


# -- benchmark contamination check ------------------------------------------

_CONTAM_SHINGLES = f"""
  SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, len({tokens_sql('text')}) - {CONTAM_NGRAM - 1}),
                          i -> array_to_string({tokens_sql('text')}[i:i + {CONTAM_NGRAM - 1}], ' '))
         )) AS shingle
  FROM documents
  WHERE len({tokens_sql('text')}) >= {CONTAM_NGRAM}
"""

_CONTAM_ORACLE = f"""
WITH sh AS ({_CONTAM_SHINGLES}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
matched AS (
  SELECT doc_id, count(*) AS n_matched
  FROM corpus SEMI JOIN bench USING (shingle) GROUP BY doc_id
),
totals AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles, coalesce(m.n_matched, 0) AS n_matched,
       round(CAST(coalesce(m.n_matched, 0) AS DOUBLE) / t.n_shingles, 6)
         AS containment
FROM totals t LEFT JOIN matched m ON t.doc_id = m.doc_id
"""


def _contam_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct word CONTAM_NGRAM-grams per doc."""
    grams = F.expr(
        f"transform(sequence(0, size(_toks) - {CONTAM_NGRAM}),"
        f" i -> concat_ws(' ', slice(_toks, i + 1, {CONTAM_NGRAM})))"
    )
    return (
        d.withColumn("_toks", tokens("text"))
        .filter(F.size("_toks") >= CONTAM_NGRAM)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


@register(
    "contamination_check",
    _CONTAM_ORACLE,
    doc=f"benchmark contamination: fraction of each corpus doc's word "
    f"{CONTAM_NGRAM}-grams that appear in the benchmark set (here: every "
    f"{BENCH_MOD}th doc — a fixture-only definition; real benchmark sets "
    "are KBs). Join strategy left to AQE: broadcast while the bench set "
    "fits, shuffled (skew-splittable) above the threshold",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE left join + ONE aggregation: n_shingles and n_matched fall out
    # of the same pass (the bench side is distinct on the join key, so
    # the join preserves corpus cardinality).  No cache — the exploded
    # shingle table is corpus-sized and caching it is exactly what a
    # 100 TB run cannot do; the two scans (bench leg, corpus leg) are
    # cheaper than materializing the explosion.
    #
    # Join strategy is left to AQE deliberately: a real benchmark set
    # (MMLU/GSM8K/…) is KBs and broadcasts, but THIS fixture's bench set
    # is every BENCH_MOD-th doc — 1/BENCH_MOD of the corpus — so a
    # forced broadcast would grow linearly with the corpus and OOM at
    # scale.  AQE picks broadcast-hash while the built set fits
    # autoBroadcastJoinThreshold and falls back to a (skew-splittable)
    # shuffled join above it.
    sh = _contam_shingles(_docs(spark, sf_dir))
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") % BENCH_MOD != 0)
    m = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return (
        corpus.join(bench, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            m.alias("n_matched"),
            F.round(m / F.count("*"), 6).alias("containment"),
        )
    )


# -- unigram LM scoring -----------------------------------------------------

_LM_TOK = f"""
  SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents
"""

_LM_ORACLE = f"""
WITH tok AS ({_LM_TOK}),
counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
vocab AS (
  SELECT token, cnt FROM (
    SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS r
    FROM counts
  ) WHERE r <= {LM_VOCAB_K}
),
total AS (SELECT count(*) AS n FROM tok)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(log10(CAST(coalesce(v.cnt, 0) + 0.5 AS DOUBLE) / total.n)), 4)
         AS avg_logprob
FROM tok t LEFT JOIN vocab v ON t.token = v.token CROSS JOIN total
GROUP BY t.doc_id, total.n
"""


@register(
    "unigram_logprob",
    _LM_ORACLE,
    doc=f"unigram LM quality score: mean log10 probability per doc against "
    f"a top-{LM_VOCAB_K} vocabulary with +0.5 OOV smoothing. The vocab is "
    "bounded by construction, so the scoring join broadcasts instead of "
    "shuffling on the Zipf-skewed token key",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    # Persist COUNTS (distinct-token-sized), never the exploded token
    # stream (corpus-sized — uncacheable at the 100 TB design point).
    # vocab and total both derive from counts, so this one bounded cache
    # saves a full re-tokenization scan; the scoring join below is the
    # only other pass over tok.
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt")).persist()
    # eager: vocab and total both arrive as BROADCASTS — lazy persist
    # would let the two broadcast threads race the fill and re-run the
    # tokenize pass (r7 class)
    counts.count()
    # distributed top-K (TakeOrderedAndProject), not a global window —
    # see q_vocab_topk
    vocab = counts.orderBy(F.col("cnt").desc(), "token").limit(LM_VOCAB_K)
    total = counts.agg(F.sum("cnt").alias("n"))
    lp = F.log10((F.coalesce(F.col("cnt"), F.lit(0)) + 0.5) / F.col("n"))
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )


# -- multi-granularity time rollup ------------------------------------------

_ROLLUP_ORACLE = """
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
         value
  FROM events
)
SELECT event_type,
       CASE WHEN GROUPING(h) = 1 THEN 'day' ELSE 'hour' END AS granularity,
       CASE WHEN GROUPING(h) = 1 THEN epoch_ms(d) ELSE epoch_ms(h) END
         AS bucket_ms,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM b
GROUP BY GROUPING SETS ((event_type, d), (event_type, d, h))
"""


@register(
    "time_bucket_rollup",
    _ROLLUP_ORACLE,
    doc="hypertable-style continuous aggregate: hour+day rollups in ONE "
    "scan via GROUPING SETS (map-side partial agg covers both grains)",
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inline-resolved plan via DataFrame.groupingSets — no temp view.
    # (The previous temp-view formulation resolved lazily against a
    # session-global name: a second call with a different sf_dir before
    # the first DataFrame was acted on silently rebound its source.)
    b = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    )
    grouped = b.groupingSets(
        [["event_type", "d"], ["event_type", "d", "h"]], "event_type", "d", "h"
    ).agg(
        F.grouping("h").alias("_gh"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    # epoch via timestampdiff from the NTZ epoch: timezone-independent
    # (unix_millis(cast(... as timestamp)) would shift on non-UTC sessions)
    def _epoch_ms(col: str):
        return F.expr(
            f"timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )

    return grouped.select(
        "event_type",
        F.when(F.col("_gh") == 1, "day").otherwise("hour").alias("granularity"),
        F.when(F.col("_gh") == 1, _epoch_ms("d"))
        .otherwise(_epoch_ms("h"))
        .alias("bucket_ms"),
        "n",
        "sum_value",
    )


# -- incremental (cross-snapshot) dedup -------------------------------------

_INCR_ORACLE = f"""
WITH fp AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
existing AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 <> 0),
incoming AS (SELECT * FROM fp WHERE doc_id % 10 = 0)
SELECT doc_id, fingerprint
FROM incoming ANTI JOIN existing USING (fingerprint)
"""


@register(
    "incremental_dedup",
    _INCR_ORACLE,
    doc="cross-snapshot dedup: new batch anti-joined against the existing "
    "corpus's fingerprint set — the shuffle is on the 128-bit fingerprint "
    "(uniform), never on content",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import fingerprint

    fp = _docs(spark, sf_dir).select(
        "doc_id", fingerprint("text").alias("fingerprint")
    )
    existing = fp.filter(F.col("doc_id") % 10 != 0).select("fingerprint").distinct()
    incoming = fp.filter(F.col("doc_id") % 10 == 0)
    return incoming.join(existing, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


# -- deterministic per-group sampling ---------------------------------------

_SAMPLE_ORACLE = f"""
SELECT doc_id, source, rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {hash60_sql("doc_id::VARCHAR", "sample")},
                                     doc_id) AS rank
  FROM documents
) WHERE rank <= {SAMPLE_PER_GROUP}
"""


@register(
    "stratified_sample",
    _SAMPLE_ORACLE,
    doc=f"deterministic stratified sample: {SAMPLE_PER_GROUP} docs per "
    "source by content-stable hash order — reproducible, no RNG, one "
    "partition-local window per stratum",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        hash60(F.col("doc_id").cast("string"), "sample"), "doc_id"
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SAMPLE_PER_GROUP)
        .select("doc_id", "source", "rank")
    )


# -- sequence packing (concatenate-and-chunk) -------------------------------
#
# Pretraining doesn't feed one doc per sequence: the tokenized corpus
# is CONCATENATED in a deterministic order and sliced into fixed
# SEQ_LEN windows (GPT-style packing).  The distributed primitive
# underneath is a global prefix sum of token counts — which naive
# Spark writes as an unpartitioned window (single-partition funnel);
# operators/prefix_sum.py::global_cumsum is the two-phase scale-safe
# form, and this query driver-checks it against DuckDB's native
# cumulative window.

SEQ_LEN = 256

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len({tokens_sql('text')}) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       cum - n_tokens AS start_offset,
       (cum - n_tokens) // {SEQ_LEN} AS first_seq,
       (cum - 1) // {SEQ_LEN} AS last_seq
FROM c
"""


@register(
    "sequence_packing",
    _PACK_ORACLE,
    doc=f"GPT-style sequence packing: global token prefix-sum (two-phase "
    f"distributed scan, no single-partition window) maps every doc to its "
    f"[first_seq, last_seq] range of {SEQ_LEN}-token training sequences",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.prefix_sum import global_cumsum

    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    c = global_cumsum(t, "n_tokens", "doc_id", out_col="cum")
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.expr(f"(cum - n_tokens) div {SEQ_LEN}").alias("first_seq"),
        F.expr(f"(cum - 1) div {SEQ_LEN}").alias("last_seq"),
    )


# -- data-mixture report ----------------------------------------------------
#
# The table a pretraining run is actually configured from: per-source
# doc/token mass and corpus share (mixture weights are tuned against
# exactly this).  One scan, two linear aggregations.

_MIX_ORACLE = f"""
WITH t AS (
  SELECT source, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tot.total, 6) AS token_share
FROM s CROSS JOIN tot
"""


@register(
    "source_mix_report",
    _MIX_ORACLE,
    doc="pretraining data-mixture report: per-source doc/token mass and "
    "token share — the table mixture weights are tuned against",
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs(spark, sf_dir).select(
        "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    s = t.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    tot = s.agg(F.sum("n_tokens").alias("total"))
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias(
            "token_share"
        ),
    )


# -- deterministic weighted sampling ----------------------------------------
#
# Quality-proportional downsampling without RNG state: doc kept iff
# hash60(doc_id) / 2^60 < weight, where weight is the quality score —
# reproducible across engines, runs, and retries (the same property
# hash_split relies on), and trivially parallel.

_WSAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source,
         round( least(1.0, len({tokens_sql('text')}) / 50.0) * 0.4
              + {stopword_ratio_sql('text')} * 0.4
              + (1.0 - {punct_ratio_sql('text')}) * 0.2, 6) AS weight,
         CAST({hash60_sql("doc_id::VARCHAR", "wsample")} AS DOUBLE)
           / pow(2, 60) AS u
  FROM documents
)
SELECT doc_id, source, weight FROM w WHERE u < weight
"""


@register(
    "weighted_sample",
    _WSAMPLE_ORACLE,
    doc="deterministic quality-weighted sampling: keep probability = "
    "quality score, uniform variate = content-stable hash — no RNG "
    "state, identical across engines/runs/retries",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import (
        punct_ratio,
        stopword_ratio,
        token_count,
    )

    weight = F.round(
        F.least(F.lit(1.0), token_count("text") / 50.0) * 0.4
        + stopword_ratio("text") * 0.4
        + (1.0 - punct_ratio("text")) * 0.2,
        6,
    )
    u = hash60(F.col("doc_id").cast("string"), "wsample").cast("double") / F.pow(
        F.lit(2), 60
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", weight.alias("weight"), u.alias("_u"))
        .filter(F.col("_u") < F.col("weight"))
        .drop("_u")
    )


# -- weighted reservoir sampling (Efraimidis–Spirakis) ------------------------

# Distributed weighted sampling WITHOUT replacement: each doc gets key
# ln(u)/w (u content-stable uniform from hash60, w = n_chars weight);
# the top-K keys per source are exactly an Efraimidis–Spirakis (2006)
# weighted reservoir — mergeable across shards (keep each shard's
# top-K, re-top-K the union), RNG-free and replay-stable like
# ``weighted_sample`` (Bernoulli twin).  Adjacent ranked keys are
# ~1/n apart, astronomically wider than cross-engine libm ulp drift,
# so the selected set is engine-stable.

ES_SAMPLE_K = 10
_ES_U = f"(({hash60_sql('text', 'essample')} + 0.5) / {float(1 << 60)})"

_ES_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln({_ES_U}) / n_chars AS es_key
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars, es_key,
         row_number() OVER (PARTITION BY source
                            ORDER BY es_key DESC, doc_id) AS rn
  FROM keyed
)
SELECT source, doc_id, n_chars, round(es_key, 6) AS es_key
FROM ranked WHERE rn <= {ES_SAMPLE_K}
"""


@register(
    "weighted_reservoir_sample",
    _ES_ORACLE,
    doc=f"Efraimidis–Spirakis weighted reservoir: top-{ES_SAMPLE_K} docs "
    "per source by ln(u)/weight with a content-stable uniform — exact "
    "weighted sampling without replacement, mergeable across shards "
    "(per-shard top-K then re-top-K), RNG-free/replay-stable; ranking "
    "window is partitioned per source, never global",
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huracan_spark.functions.textfns import hash60

    d = _docs(spark, sf_dir)
    u = (hash60(F.col("text"), "essample") + 0.5) / float(1 << 60)
    keyed = d.select(
        "source", "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("es_key")
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ES_SAMPLE_K)
        .select("source", "doc_id", "n_chars", F.round("es_key", 6).alias("es_key"))
    )


# -- Neyman-allocated stratified sampling -------------------------------------

# Optimal stratified allocation: stratum quota proportional to
# N_h * S_h (size x std of the target metric), then a deterministic
# hash-ordered take per stratum — the variance-minimizing upgrade of
# the equal-quota `stratified_sample`.  Stats are |sources| rows
# (broadcast); the quota window ranks within strata only.

NEYMAN_TOTAL = 100

_NEYMAN_ORACLE = f"""
WITH stats AS (
  SELECT source, count(*) AS n_h, stddev_samp(n_chars) AS s_h
  FROM documents GROUP BY source
),
alloc AS (
  SELECT source, n_h,
         greatest(1, CAST(round({NEYMAN_TOTAL} * (n_h * s_h)
             / (SELECT sum(n_h * s_h) FROM stats)) AS BIGINT)) AS quota
  FROM stats
),
ranked AS (
  SELECT d.doc_id, d.source, d.n_chars, a.quota,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY {hash60_sql('text', 'neyman')}, d.doc_id)
           AS rn
  FROM documents d JOIN alloc a ON d.source = a.source
)
SELECT doc_id, source, n_chars FROM ranked WHERE rn <= quota
"""


@register(
    "neyman_stratified_sample",
    _NEYMAN_ORACLE,
    doc=f"Neyman-allocated stratified sample (~{NEYMAN_TOTAL} docs): "
    "per-source quota proportional to N_h*S_h of n_chars (variance-"
    "minimizing allocation), deterministic hash-ordered take within "
    "each stratum — RNG-free, replay-stable, stats broadcast",
)
def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from huracan_spark.functions.textfns import hash60

    d = _docs(spark, sf_dir)
    stats = d.groupBy("source").agg(
        F.count("*").alias("n_h"), F.stddev_samp("n_chars").alias("s_h")
    )
    tot = stats.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("mass"))
    alloc = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        F.greatest(
            F.lit(1),
            F.round(NEYMAN_TOTAL * F.col("n_h") * F.col("s_h") / F.col("mass"))
            .cast("long"),
        ).alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        hash60(F.col("text"), "neyman"), "doc_id"
    )
    return (
        d.join(F.broadcast(alloc), "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "n_chars")
    )
