"""Data-profiling / segmentation queries over the corpus and the
order history (beyond-reference extensions per the build brief).

- ``doclen_lognormal_fit`` — per-source log-normal MLE of the
  document-length distribution (mu/sigma of ln n_chars) + moment
  check.  The one-line generative model of a text corpus; a source
  whose lengths stop being log-normal usually changed extraction
  pipelines.  Single scan, |sources|-bounded output.
- ``vocab_coverage_curve`` — how many vocabulary types cover 90% of
  the token mass.  The cumulative mass runs through the distributed
  prefix-sum operator (``operators/prefix_sum.py::global_cumsum`` —
  range partition + per-partition window + offset merge, NEVER a
  single-partition window over the vocabulary, which at 100 TB has
  hundreds of millions of types).
- ``bigram_conditional_entropy`` — H(next|prev) = H(bigram) -
  H(unigram) over adjacent-token pairs: the sequence-predictability
  number (how much a 1-gram LM is leaving on the table).  Long-form
  adjacency join on (doc_id, pos+1); entropy folds over type-bounded
  count tables.
- ``customer_rfm_segments`` — classic recency/frequency/monetary
  segmentation: per-customer stats -> tercile boundaries
  (percentile_cont over EXACT integer inputs — monetary is integer
  cents so cross-engine interpolation is deterministic) -> 1..3
  scores -> bounded 27-segment rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

COVERAGE_Q = 0.9


# -- per-source log-normal fit of document lengths --------------------------

_LOGNORM_ORACLE = """
WITH d AS (
  SELECT source, ln(CAST(n_chars AS DOUBLE)) AS l, n_chars
  FROM documents WHERE n_chars > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(l), 6) AS mu,
       round(stddev_pop(l), 6) AS sigma,
       round(exp(avg(l)), 2) AS geo_mean_chars,
       round(avg(n_chars), 2) AS arith_mean_chars
FROM d GROUP BY source
"""


@register(
    "doclen_lognormal_fit",
    _LOGNORM_ORACLE,
    doc="per-source log-normal MLE (mu/sigma of ln n_chars) with "
    "geometric vs arithmetic mean — the corpus length-distribution "
    "model; one scan, |sources|-bounded output",
)
def q_doclen_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("source", "n_chars", F.log(F.col("n_chars").cast("double")).alias("l"))
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("l"), 6).alias("mu"),
        F.round(F.stddev_pop("l"), 6).alias("sigma"),
        F.round(F.exp(F.avg("l")), 2).alias("geo_mean_chars"),
        F.round(F.avg("n_chars"), 2).alias("arith_mean_chars"),
    )


# -- vocabulary coverage via distributed prefix sum -------------------------

_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT unnest({tokens_sql('text')}) AS token FROM documents
),
freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM freq),
ordered AS (
  SELECT n,
         sum(n) OVER (ORDER BY n DESC, token
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM freq
)
SELECT CAST(t.vocab AS BIGINT) AS vocab_size,
       CAST(t.total AS BIGINT) AS total_tokens,
       CAST((SELECT count(*) FROM ordered o, tot tt
             WHERE o.cum < {COVERAGE_Q} * tt.total) + 1 AS BIGINT)
         AS k_{int(COVERAGE_Q * 100)}
FROM tot t
"""


@register(
    "vocab_coverage_curve",
    _COVERAGE_ORACLE,
    doc=f"types needed to cover {int(COVERAGE_Q*100)}% of token mass — "
    "the cumulative mass runs through the distributed prefix-sum "
    "operator (range partition + local window + offset merge), never "
    "a single-partition window over the vocabulary; k is derived as "
    "count(cum < q*total)+1, so no rank column is needed",
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.prefix_sum import global_cumsum

    d = load_table(spark, sf_dir, "documents")
    # freq is vocabulary-bounded: persist eagerly so tot, the maxn
    # broadcast and the keyed prefix-sum input read the cached table
    # instead of each re-running the corpus tokenize+count pass
    freq = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    freq.count()
    tot = freq.agg(
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("vocab"),
    )
    # unique ascending order key realizing (freq desc, token asc):
    # zero-padded (max_n - n) then the token string
    maxn = freq.agg(F.max("n").alias("maxn"))
    keyed = freq.crossJoin(F.broadcast(maxn)).select(
        "n",
        F.format_string("%019d|%s", F.col("maxn") - F.col("n"), F.col("token")).alias(
            "okey"
        ),
    )
    cum = global_cumsum(keyed, "n", "okey", out_col="cum")
    below = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") < F.lit(COVERAGE_Q) * F.col("total"))
        .agg(F.count("*").alias("n_below"))
    )
    return tot.crossJoin(F.broadcast(below)).select(
        F.col("vocab").alias("vocab_size"),
        F.col("total").alias("total_tokens"),
        (F.col("n_below") + 1).cast("long").alias(f"k_{int(COVERAGE_Q * 100)}"),
    )


# -- bigram conditional entropy ---------------------------------------------

_CONDENT_ORACLE = f"""
WITH tokpos AS (
  SELECT doc_id, t.token, t.pos
  FROM documents,
       LATERAL (SELECT unnest({tokens_sql('text')}) AS token,
                       generate_subscripts({tokens_sql('text')}, 1) AS pos) t
),
uni AS (SELECT token, count(*) AS n FROM tokpos GROUP BY token),
utot AS (SELECT sum(n) AS t FROM uni),
big AS (
  SELECT a.token AS x, b.token AS y, count(*) AS n
  FROM tokpos a JOIN tokpos b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.token, b.token
),
btot AS (SELECT sum(n) AS t FROM big),
h1 AS (SELECT -sum((n / t.t) * ln(n / t.t)) AS h FROM uni CROSS JOIN utot t),
h2 AS (SELECT -sum((n / t.t) * ln(n / t.t)) AS h FROM big CROSS JOIN btot t)
SELECT round(h1.h, 6) AS h_unigram,
       round(h2.h, 6) AS h_bigram,
       round(h2.h - h1.h, 6) AS h_conditional
FROM h1 CROSS JOIN h2
"""


@register(
    "bigram_conditional_entropy",
    _CONDENT_ORACLE,
    doc="H(next|prev) = H(bigram) - H(unigram) over adjacent token "
    "pairs — sequence predictability; adjacency via equi-join on "
    "(doc_id, pos+1), entropy folds over type-bounded count tables",
)
def q_bigram_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # adjacency is a PER-ROW property of the token array: zip the array
    # with its own 1-shifted slice instead of equi-self-joining the
    # exploded token-position table — the join shuffled the corpus-sized
    # tokpos table TWICE (both sides) before the grid-bounded count;
    # the slice-zip emits the same adjacent-pair multiset from the scan
    # itself, so the only shuffles left are the partial-agg'd count
    # tables.  `toks` lives in its own projection: it is referenced 4x
    # below and tokens() is non-cheap, so CollapseProject keeps the
    # barrier and the tokenize runs once per row, not once per slice.
    t = d.select(tokens("text").alias("toks"))
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    adj = F.zip_with(
        F.slice("toks", 1, n1),
        F.slice("toks", 2, n1),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    uni = (
        t.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    utot = uni.agg(F.sum("n").alias("t"))
    big = (
        t.select(F.explode(adj).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("n"))
    )
    btot = big.agg(F.sum("n").alias("t"))
    h1 = (
        uni.crossJoin(F.broadcast(utot))
        .agg((-F.sum((F.col("n") / F.col("t")) * F.log(F.col("n") / F.col("t")))).alias("h"))
    )
    h2 = (
        big.crossJoin(F.broadcast(btot))
        .agg((-F.sum((F.col("n") / F.col("t")) * F.log(F.col("n") / F.col("t")))).alias("h"))
    )
    return (
        h1.select(F.col("h").alias("h1"))
        .crossJoin(F.broadcast(h2.select(F.col("h").alias("h2"))))
        .select(
            F.round("h1", 6).alias("h_unigram"),
            F.round("h2", 6).alias("h_bigram"),
            F.round(F.col("h2") - F.col("h1"), 6).alias("h_conditional"),
        )
    )


# -- customer RFM segmentation ----------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey AS c,
         date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
b AS (
  SELECT quantile_cont(recency_days, [1.0/3, 2.0/3]) AS rb,
         quantile_cont(frequency, [1.0/3, 2.0/3]) AS fb,
         quantile_cont(monetary_cents, [1.0/3, 2.0/3]) AS mb
  FROM per_cust
),
scored AS (
  SELECT
    CASE WHEN recency_days <= rb[1] THEN 3
         WHEN recency_days <= rb[2] THEN 2 ELSE 1 END AS r_score,
    CASE WHEN frequency <= fb[1] THEN 1
         WHEN frequency <= fb[2] THEN 2 ELSE 3 END AS f_score,
    CASE WHEN monetary_cents <= mb[1] THEN 1
         WHEN monetary_cents <= mb[2] THEN 2 ELSE 3 END AS m_score,
    monetary_cents
  FROM per_cust CROSS JOIN b
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
FROM scored GROUP BY r_score, f_score, m_score
"""


@register(
    "customer_rfm_segments",
    _RFM_ORACLE,
    doc="RFM segmentation: per-customer recency/frequency/monetary "
    "(monetary as EXACT integer cents so tercile interpolation is "
    "engine-deterministic), tercile scores from a 1-row broadcast "
    "boundary table, bounded 27-segment rollup",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("dmax"))
    per_cust = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("dmax"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    b = per_cust.agg(
        F.percentile("recency_days", F.lit(1.0 / 3)).alias("r1"),
        F.percentile("recency_days", F.lit(2.0 / 3)).alias("r2"),
        F.percentile("frequency", F.lit(1.0 / 3)).alias("f1"),
        F.percentile("frequency", F.lit(2.0 / 3)).alias("f2"),
        F.percentile("monetary_cents", F.lit(1.0 / 3)).alias("m1"),
        F.percentile("monetary_cents", F.lit(2.0 / 3)).alias("m2"),
    )
    s = per_cust.crossJoin(F.broadcast(b))
    r_score = (
        F.when(F.col("recency_days") <= F.col("r1"), 3)
        .when(F.col("recency_days") <= F.col("r2"), 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") <= F.col("f1"), 1)
        .when(F.col("frequency") <= F.col("f2"), 2)
        .otherwise(3)
    )
    m_score = (
        F.when(F.col("monetary_cents") <= F.col("m1"), 1)
        .when(F.col("monetary_cents") <= F.col("m2"), 2)
        .otherwise(3)
    )
    return (
        s.select(
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
            "monetary_cents",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("segment_cents"),
        )
    )


# -- shipping delay by order priority ---------------------------------------

_SHIPDELAY_ORACLE = """
WITH j AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(delay_days), 4) AS avg_delay_days,
       round(CAST(quantile_cont(delay_days, 0.5) AS DOUBLE), 6) AS p50_delay,
       round(CAST(quantile_cont(delay_days, 0.95) AS DOUBLE), 6) AS p95_delay,
       CAST(max(delay_days) AS BIGINT) AS max_delay
FROM j GROUP BY priority
"""


@register(
    "ship_delay_by_priority",
    _SHIPDELAY_ORACLE,
    doc="order-to-ship latency distribution per order priority — the "
    "SLA audit: one fact-to-fact equi-join (orders side prunable to "
    "two columns), exact integer-day percentiles per bounded priority "
    "group",
)
def q_ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    return j.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.avg("delay_days"), 4).alias("avg_delay_days"),
        F.round(F.percentile("delay_days", F.lit(0.5)), 6).alias("p50_delay"),
        F.round(F.percentile("delay_days", F.lit(0.95)), 6).alias("p95_delay"),
        F.max("delay_days").cast("long").alias("max_delay"),
    )


# -- burst (bot) detection: max events per user-minute ----------------------

_BURST_ORACLE = """
WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS m, count(*) AS n
  FROM events GROUP BY user_id, m
),
peaks AS (
  SELECT user_id,
         max(n) AS peak_per_min,
         CAST(count(*) AS BIGINT) AS active_minutes,
         CAST(sum(n) AS BIGINT) AS total_events
  FROM per_min GROUP BY user_id
)
SELECT user_id, CAST(peak_per_min AS BIGINT) AS peak_per_min,
       active_minutes, total_events
FROM peaks
WHERE peak_per_min >= 2
"""


@register(
    "user_burst_detection",
    _BURST_ORACLE,
    doc="abuse/bot heuristic: per-user peak events-per-minute via a "
    "(user, minute) hash agg then a per-user rollup — two linear "
    "partial aggs, no windows; flags users with bursty request rates",
)
def q_user_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.count("*").alias("n"))
    peaks = per_min.groupBy("user_id").agg(
        F.max("n").cast("long").alias("peak_per_min"),
        F.count("*").cast("long").alias("active_minutes"),
        F.sum("n").cast("long").alias("total_events"),
    )
    return peaks.filter(F.col("peak_per_min") >= 2)


# -- per-source exact-duplicate rate ----------------------------------------

_DUPRATE_ORACLE = """
WITH fp AS (
  SELECT source, md5(text) AS fp FROM documents
),
grp AS (
  SELECT fp, count(*) AS n FROM fp GROUP BY fp
),
flagged AS (
  SELECT f.source, CASE WHEN g.n > 1 THEN 1 ELSE 0 END AS is_dup
  FROM fp f JOIN grp g ON g.fp = f.fp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_in_dup_groups,
       round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_frac
FROM flagged GROUP BY source
"""


@register(
    "source_dup_rate",
    _DUPRATE_ORACLE,
    doc="per-source exact-duplicate exposure: fraction of docs whose "
    "content fingerprint repeats corpus-wide — the source-quality "
    "ranking input for mixture decisions; fingerprint groupBy + one "
    "equi-join back, both corpus-linear",
)
def q_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("source", F.md5(F.col("text")).alias("fp"))
    grp = fp.groupBy("fp").agg(F.count("*").alias("n"))
    flagged = fp.join(grp, "fp").select(
        "source", (F.col("n") > 1).cast("int").alias("is_dup")
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_in_dup_groups"),
        F.round(F.sum("is_dup").cast("double") / F.count("*"), 6).alias(
            "dup_frac"
        ),
    )


# -- hour-of-week seasonality profile ---------------------------------------

_HOW_ORACLE = """
WITH grid AS (
  SELECT (CAST(isodow(ts) AS BIGINT) - 1) * 24 + CAST(hour(ts) AS BIGINT)
           AS how,
         count(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT sum(n) AS t, avg(n) AS mean_n, stddev_samp(n) AS sd FROM grid)
SELECT g.how, CAST(g.n AS BIGINT) AS n,
       round(g.n / t.t, 6) AS share,
       round((g.n - t.mean_n) / t.sd, 4) AS z
FROM grid g CROSS JOIN tot t
"""


@register(
    "hour_of_week_profile",
    _HOW_ORACLE,
    doc="168-slot hour-of-week seasonality profile with share and "
    "z-score per slot — the traffic-shape fingerprint; one count "
    "scan, stats broadcast over the bounded grid",
)
def q_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    how = (
        (F.dayofweek(F.col("ts")) + 5) % 7
    ) * 24 + F.hour("ts")  # Mon=0 ... Sun=6, matching isodow-1
    grid = ev.groupBy(how.cast("long").alias("how")).agg(
        F.count("*").alias("n")
    )
    tot = grid.agg(
        F.sum("n").alias("t"),
        F.avg("n").alias("mean_n"),
        F.stddev_samp("n").alias("sd"),
    )
    return grid.crossJoin(F.broadcast(tot)).select(
        "how",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("t"), 6).alias("share"),
        F.round((F.col("n") - F.col("mean_n")) / F.col("sd"), 4).alias("z"),
    )


# -- higher-moment value statistics per type --------------------------------
#
# Skewness / excess kurtosis per event type, computed EXPLICITLY from
# raw power sums (one partial-agg scan).  Deliberately not the
# engines' built-in skewness()/kurtosis(): Spark returns population
# g1/g2 while DuckDB returns sample-corrected G1/G2 — the explicit
# central-moment formulas are the only cross-engine-stable shape, and
# they're also the mergeable form a distributed profiler wants
# (power sums combine across shards by addition).

_MOMENTS_ORACLE = """
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         sum(value) AS s1,
         sum(value * value) AS s2,
         sum(value * value * value) AS s3,
         sum(value * value * value * value) AS s4
  FROM events GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         s1 / n AS mean,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * pow(s1 / n, 4) AS m4
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round(mean, 6) AS mean_value,
       round(sqrt(m2), 6) AS std_pop,
       round(m3 / pow(m2, 1.5), 6) AS skewness_g1,
       round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis_g2
FROM m
"""


@register(
    "value_moments_per_type",
    _MOMENTS_ORACLE,
    doc="population skewness + excess kurtosis per event type from raw "
    "power sums (one partial-agg scan; mergeable across shards by "
    "addition) — explicit central-moment formulas because the engines' "
    "built-in skewness/kurtosis use different sample corrections",
)
def q_value_moments_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) + 2 * F.pow(mean, 3)
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * F.pow(mean, 4)
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean_value"),
        F.round(F.sqrt(m2), 6).alias("std_pop"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis_g2"),
    )
