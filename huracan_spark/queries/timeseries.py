"""Time-series / behavioral analytics over the ``events`` stream table.

Five operators a production analytics engine layers on an event store
(beyond-reference extension per the build brief; the reference's
analytics corpus stops at counts/distincts — SURVEY §2.6):

- ``event_transition_matrix`` — first-order Markov transitions between
  consecutive event types per user (the "what do users do next"
  query).  Per-user window only (never a global sort); the output is
  bounded by |event_type|^2.
- ``user_behavior_entropy`` — Shannon entropy of each user's
  event-type distribution (behavioral diversity signal).  Two linear
  aggs + a join on user_id; the entropy fold is over <= |event_type|
  terms per user.
- ``gap_fill_daily`` — calendar spine per event type with
  forward-filled daily averages (the classic time-series gap-fill /
  LOCF).  The spine is |types| x |days| rows by construction; the
  forward-fill window is per-type over the bounded day count, never
  over raw events.
- ``ewma_daily_value`` — exponentially weighted moving average of the
  per-type daily mean.  The recursive fold is order-pinned on BOTH
  engines (Spark: ``aggregate`` HOF over a sorted bounded array;
  DuckDB: recursive CTE), so the doubles are bit-identical before the
  final round.  The collected array is bounded by calendar days, not
  data volume.
- ``winsorized_mean_per_type`` — robust mean after clipping at exact
  interpolated p05/p95 (outlier-trimmed KPI).  The percentile pass
  aggregates per type; the 5-row stats table broadcasts back onto the
  scan.

All pure ``pyspark.sql.functions``; no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# -- first-order Markov transition matrix -----------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
pairs AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
"""


@register(
    "event_transition_matrix",
    _TRANSITION_ORACLE,
    doc="first-order Markov transitions between consecutive event types "
    "per user (lag window partitioned by user — tie-broken by event_id, "
    "never a global order); output bounded by |event_type|^2, the "
    "row-probability window runs over that bounded matrix only",
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    row_total = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(row_total), 6).alias("p"),
    )


# -- behavioral entropy per user --------------------------------------------

_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events
  GROUP BY user_id, event_type
),
t AS (
  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
         count(*) AS n_types
  FROM c GROUP BY user_id
)
SELECT t.user_id, t.n_events, t.n_types,
       round(-sum((c.cnt / CAST(t.n_events AS DOUBLE))
                  * log2(c.cnt / CAST(t.n_events AS DOUBLE))), 6)
         AS behavior_entropy
FROM c JOIN t USING (user_id)
GROUP BY t.user_id, t.n_events, t.n_types
"""


@register(
    "user_behavior_entropy",
    _ENTROPY_ORACLE,
    doc="Shannon entropy of each user's event-type distribution "
    "(behavioral-diversity signal); two linear hash aggs + an equi-join "
    "on user_id, entropy fold over <= |event_type| terms per user — "
    "no window, no self-join",
)
def q_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    t = c.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").alias("n_types"),
    )
    p = F.col("cnt") / F.col("n_events").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "n_events", "n_types")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("behavior_entropy"))
    )


# -- calendar gap-fill with forward fill (LOCF) ------------------------------

_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
         count(*) AS n, round(avg(value), 6) AS avg_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
  FROM events
),
spine AS (
  SELECT t.event_type, epoch_ms(gs.d) AS day_ms
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM bounds
  ) gs
)
SELECT s.event_type, s.day_ms,
       coalesce(d.n, 0) AS n,
       last_value(d.avg_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.day_ms
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS avg_value_filled
FROM spine s LEFT JOIN daily d USING (event_type, day_ms)
"""


@register(
    "gap_fill_daily",
    _GAPFILL_ORACLE,
    doc="time-series gap fill: dense calendar spine per event type with "
    "forward-filled (LOCF) daily averages; the spine is |types| x |days| "
    "rows by construction and the fill window runs per type over that "
    "bounded series — raw events are touched once, in the daily agg",
)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day_ms = F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
    daily = ev.groupBy(
        "event_type", day_ms.alias("day_ms")
    ).agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    ).select(F.unix_millis(F.col("d").cast("timestamp")).alias("day_ms"))
    types = ev.select("event_type").distinct()
    # both spine sides are bounded (|types|, |days|) -> broadcast cross
    spine = types.crossJoin(F.broadcast(days))
    fill = (
        Window.partitionBy("event_type")
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(daily, ["event_type", "day_ms"], "left").select(
        "event_type",
        "day_ms",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.last("avg_value", ignorenulls=True).over(fill).alias("avg_value_filled"),
    )


# -- EWMA of the per-type daily mean ----------------------------------------

EWMA_ALPHA = 0.3

# The fold is order-pinned on both engines: Spark folds a sorted
# bounded array with the `aggregate` HOF; DuckDB unrolls the identical
# recurrence e_t = a*x_t + (1-a)*e_{t-1} (e_1 = x_1) via recursive CTE.
# Inputs are pre-rounded to 6dp so both sides fold the same doubles ->
# bit-identical result before the final round(4).

_EWMA_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
         round(avg(value), 6) AS x
  FROM events GROUP BY 1, 2
),
numbered AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day_ms) AS rn
  FROM daily
),
rec AS (
  SELECT event_type, rn, x AS e FROM numbered WHERE rn = 1
  UNION ALL
  SELECT d.event_type, d.rn, {EWMA_ALPHA} * d.x + {1 - EWMA_ALPHA} * r.e
  FROM numbered d JOIN rec r
    ON d.event_type = r.event_type AND d.rn = r.rn + 1
)
SELECT event_type, max(rn) AS n_days, round(max_by(e, rn), 4) AS ewma
FROM rec GROUP BY event_type
"""


@register(
    "ewma_daily_value",
    _EWMA_ORACLE,
    doc=f"EWMA (alpha={EWMA_ALPHA}) of the per-type daily mean value — "
    "the smoothed-KPI recurrence. Raw events aggregate to a per-type "
    "daily series first; the collected array the fold runs over is "
    "bounded by calendar days, never by data volume, and the fold order "
    "is pinned (sorted array + aggregate HOF), so the recurrence is "
    "reproducible cross-engine",
)
def q_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day_ms = F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
    daily = ev.groupBy(
        "event_type", day_ms.alias("day_ms")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day_ms", "x"))).alias("s")
    )
    fold = (
        f"aggregate(slice(s, 2, size(s) - 1), "
        f"CAST(element_at(s, 1).x AS DOUBLE), "
        f"(acc, e) -> {EWMA_ALPHA}D * e.x + {1 - EWMA_ALPHA}D * acc)"
    )
    return arr.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.round(F.expr(fold), 4).alias("ewma"),
    )


# -- winsorized mean ---------------------------------------------------------

_WINSOR_ORACLE = """
WITH stats AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
       round(s.lo, 6) AS p05, round(s.hi, 6) AS p95,
       round(avg(least(greatest(e.value, s.lo), s.hi)), 4)
         AS winsorized_mean
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type, s.lo, s.hi
"""


@register(
    "winsorized_mean_per_type",
    _WINSOR_ORACLE,
    doc="robust mean after clipping at exact interpolated p05/p95 per "
    "type (outlier-trimmed KPI); the percentile pass reduces per type, "
    "the |types|-row stats table broadcasts back onto the scan — two "
    "linear passes, no corpus-wide sort",
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        )
        .select(
            "event_type",
            "n",
            F.round("lo", 6).alias("p05"),
            F.round("hi", 6).alias("p95"),
            "winsorized_mean",
        )
    )


# -- trailing 7-day active users (WAU) ----------------------------------------

# Sliding distinct-count WITHOUT the fan-out shuffle.  The r8-era shape
# exploded each (type, user, day) activity row to its 7 trailing
# windows and counted DISTINCT users per window — but those 7x rows
# are all DISTINCT keys, so the countDistinct's partial aggregate
# deduped NOTHING and 7x|au| rows shuffled into the reducers (the d3
# re-measure read exp 1.40 at sf100 on a clean small side).  The
# interval-union shape shuffles |au| once:
#   1. au = distinct (type, user, day) activity;
#   2. per (type, user), merge activity days into ISLANDS whose
#      contribution ranges [day, day+6] overlap (gap <= 6 days) —
#      a lag/cumsum window bounded per user;
#   3. each island [s, e] contributes +1 at wend=s and -1 at
#      wend=e+7 — interval-counting deltas (adjacent islands'
#      -1/+1 at the same day cancel, so only OVERLAP needs merging);
#   4. net deltas aggregate to the (type, day) CALENDAR grid (bounded:
#      types x span days) and a per-type running sum over that grid is
#      the distinct-user count for every window — each user counted
#      once per covered window by construction, no distinct at all.
# The spine (days with >= 1 event, any type) sets the output domain,
# exactly like the oracle's spine join.

WAU_DAYS = 7

_WAU_ORACLE = f"""
WITH au AS (
  SELECT DISTINCT event_type, user_id, date_trunc('day', ts) AS day
  FROM events
),
spine AS (SELECT DISTINCT day FROM au),
contrib AS (
  SELECT event_type, user_id,
         unnest(generate_series(day, day + INTERVAL {WAU_DAYS - 1} DAY,
                                INTERVAL 1 DAY)) AS wend
  FROM au
)
SELECT c.event_type, epoch_ms(c.wend) AS day_ms,
       count(DISTINCT c.user_id) AS n_active
FROM contrib c JOIN spine s ON c.wend = s.day
GROUP BY 1, 2
"""


@register(
    "trailing_7d_active_users",
    _WAU_ORACLE,
    doc=f"trailing {WAU_DAYS}-day distinct active users per event type "
    "(the WAU KPI): each activity day fans out to exactly its "
    f"{WAU_DAYS} trailing windows (bounded explode), then one distinct "
    "aggregate per (type, window) — never a distinct-over-window or a "
    "per-day re-scan",
)
def q_trailing_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    au = ev.select(
        "event_type", "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    spine = au.select("day").distinct().select(F.col("day").alias("wend"))
    # islands of overlapping [day, day+6] ranges per (type, user):
    # window state bounded per user's activity days
    wu = Window.partitionBy("event_type", "user_id").orderBy("day")
    gap = F.datediff(F.col("day"), F.lag("day").over(wu))
    isl = (
        au.withColumn(
            "_new", F.when(gap.isNull() | (gap > WAU_DAYS - 1), 1).otherwise(0)
        )
        .withColumn("_grp", F.sum("_new").over(wu))
        .groupBy("event_type", "user_id", "_grp")
        .agg(F.min("day").alias("_s"), F.max("day").alias("_e"))
    )
    deltas = isl.select(
        "event_type", F.col("_s").alias("wend"), F.lit(1).alias("_d")
    ).unionByName(
        isl.select(
            "event_type",
            (F.col("_e") + F.expr(f"INTERVAL {WAU_DAYS} DAY")).alias("wend"),
            F.lit(-1).alias("_d"),
        )
    )
    # seed the calendar grid with zero-deltas on every spine day so the
    # running sum lands on every output day (types x days — bounded)
    types = au.select("event_type").distinct()
    zeros = types.crossJoin(F.broadcast(spine)).select(
        "event_type", "wend", F.lit(0).alias("_d")
    )
    net = (
        deltas.unionByName(zeros)
        .groupBy("event_type", "wend")
        .agg(F.sum("_d").alias("_nd"))
    )
    # per-type running sum over the calendar grid (bounded rows/type)
    wt = (
        Window.partitionBy("event_type")
        .orderBy("wend")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        net.withColumn("n_active", F.sum("_nd").over(wt))
        .join(F.broadcast(spine), "wend")
        .filter(F.col("n_active") > 0)
        .select(
            "event_type",
            F.unix_millis(F.col("wend").cast("timestamp")).alias("day_ms"),
            "n_active",
        )
    )


# -- three-step ordered funnel ------------------------------------------------

# click -> view -> purchase strictly ordered within a user's history,
# evaluated per purchase WITHOUT self-joins: two conditional running
# windows (last click so far, last view so far) make the pattern test a
# row-local predicate — the MATCH_RECOGNIZE(A B C) shape as plain
# windows, state bounded per user.

_FUNNEL3_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_us,
         max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_us
  FROM events
),
hits AS (
  SELECT user_id
  FROM seq
  WHERE event_type = 'purchase'
    AND last_click_us IS NOT NULL AND last_view_us IS NOT NULL
    AND last_click_us < last_view_us
)
SELECT user_id, count(*) AS n_funnel_purchases FROM hits GROUP BY user_id
"""


@register(
    "three_step_funnel",
    _FUNNEL3_ORACLE,
    doc="ordered 3-step funnel (click -> view -> purchase) per user "
    "counted per purchase with NO self-join: two conditional running-"
    "max windows turn the sequence pattern into a row-local predicate "
    "(the MATCH_RECOGNIZE shape as plain windows, per-user partitions)",
)
def q_three_step_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        "event_type",
        F.max(F.when(F.col("event_type") == "click", us)).over(w).alias(
            "last_click_us"
        ),
        F.max(F.when(F.col("event_type") == "view", us)).over(w).alias(
            "last_view_us"
        ),
    )
    hits = seq.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_click_us").isNotNull()
        & F.col("last_view_us").isNotNull()
        & (F.col("last_click_us") < F.col("last_view_us"))
    )
    return hits.groupBy("user_id").agg(F.count("*").alias("n_funnel_purchases"))


# -- conversion latency percentiles -------------------------------------------

_CONVLAT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_us
  FROM events
),
lat AS (
  SELECT (us - last_click_us) / 1e6 AS latency_s
  FROM seq WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
)
SELECT count(*) AS n_conversions,
       round(quantile_cont(latency_s, 0.5), 4) AS p50_s,
       round(quantile_cont(latency_s, 0.9), 4) AS p90_s,
       round(quantile_cont(latency_s, 0.99), 4) AS p99_s
FROM lat
"""


@register(
    "conversion_latency_percentiles",
    _CONVLAT_ORACLE,
    doc="click-to-purchase latency p50/p90/p99: last-click-before via a "
    "per-user running window (the as-of shape), exact interpolated "
    "percentiles over the conversions only — never a corpus-wide sort",
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "event_type",
        us.alias("us"),
        F.max(F.when(F.col("event_type") == "click", us)).over(w).alias(
            "last_click_us"
        ),
    )
    lat = seq.filter(
        (F.col("event_type") == "purchase") & F.col("last_click_us").isNotNull()
    ).select(((F.col("us") - F.col("last_click_us")) / 1e6).alias("latency_s"))
    return lat.agg(
        F.count("*").alias("n_conversions"),
        F.round(F.percentile("latency_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("latency_s", F.lit(0.9)), 4).alias("p90_s"),
        F.round(F.percentile("latency_s", F.lit(0.99)), 4).alias("p99_s"),
    )


# -- Holt linear (double exponential) smoothing + forecast --------------------

# Level+trend recurrence per type over the bounded daily series, same
# order-pinning contract as ewma_daily_value: both engines replay the
# IDENTICAL arithmetic (the new-level expression is written out twice
# rather than bound to a local, so Spark's fold and DuckDB's recursion
# produce bit-identical doubles before the final round).

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_H = 7  # forecast horizon (days)

_HOLT_L = f"{HOLT_ALPHA} * d.x + {1 - HOLT_ALPHA} * (r.l + r.b)"

_HOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
         round(avg(value), 6) AS x
  FROM events GROUP BY 1, 2
),
numbered AS (
  SELECT event_type, x,
         lead(x) OVER (PARTITION BY event_type ORDER BY day_ms) AS x_next,
         row_number() OVER (PARTITION BY event_type ORDER BY day_ms) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
rec AS (
  SELECT event_type, rn, n, x AS l, x_next - x AS b
  FROM numbered WHERE rn = 1 AND n >= 2
  UNION ALL
  SELECT d.event_type, d.rn, r.n,
         {_HOLT_L},
         {HOLT_BETA} * (({_HOLT_L}) - r.l) + {1 - HOLT_BETA} * r.b
  FROM numbered d JOIN rec r
    ON d.event_type = r.event_type AND d.rn = r.rn + 1
)
SELECT event_type, max(rn) AS n_days,
       round(max_by(l, rn), 4) AS level,
       round(max_by(b, rn), 4) AS trend,
       round(max_by(l, rn) + {HOLT_H} * max_by(b, rn), 4) AS forecast_{HOLT_H}d
FROM rec GROUP BY event_type
"""


@register(
    "holt_forecast_daily",
    _HOLT_ORACLE,
    doc=f"Holt linear smoothing (alpha={HOLT_ALPHA}, beta={HOLT_BETA}) of "
    "the per-type daily mean with a "
    f"{HOLT_H}-day forecast: level+trend recurrence over the calendar-"
    "bounded series, fold order pinned on both engines (sorted array + "
    "aggregate HOF vs recursive CTE, identical arithmetic)",
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day_ms = F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
    daily = ev.groupBy("event_type", day_ms.alias("day_ms")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day_ms", "x"))).alias("s")
    ).filter(F.size("s") >= 2)
    newl = (
        f"{HOLT_ALPHA}D * e.x + {1 - HOLT_ALPHA}D * (acc.l + acc.b)"
    )
    fold = (
        f"aggregate(slice(s, 2, size(s) - 1), "
        f"named_struct('l', CAST(element_at(s, 1).x AS DOUBLE), "
        f"'b', CAST(element_at(s, 2).x - element_at(s, 1).x AS DOUBLE)), "
        f"(acc, e) -> named_struct("
        f"'l', {newl}, "
        f"'b', {HOLT_BETA}D * (({newl}) - acc.l) + {1 - HOLT_BETA}D * acc.b))"
    )
    st = F.expr(fold)
    return arr.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.round(st["l"], 4).alias("level"),
        F.round(st["b"], 4).alias("trend"),
        F.round(st["l"] + HOLT_H * st["b"], 4).alias(f"forecast_{HOLT_H}d"),
    )


# -- Kaplan–Meier weekly survival ---------------------------------------------

# Discrete-time survival of user activity: a user "dies" at their last
# active week unless it is the corpus's final week (right-censored).
# S(t) = prod over offsets <= t of (1 - d_i / n_i).  Everything after
# the per-user reduce is offset-bounded (weeks of history), so the
# cumulative product runs over a ~dozen-row series; the log-sum is
# order-pinned by the window ORDER BY on both engines.

_KM_ORACLE = """
WITH peru AS (
  SELECT user_id,
         date_diff('week', date_trunc('week', min(ts)), date_trunc('week', max(ts)))
           AS lifetime_w,
         date_trunc('week', max(ts)) = (
           SELECT date_trunc('week', max(ts)) FROM events
         ) AS censored
  FROM events GROUP BY user_id
),
offsets AS (
  SELECT lifetime_w AS t,
         count(*) AS n_end,
         count(*) FILTER (WHERE NOT censored) AS d
  FROM peru GROUP BY lifetime_w
),
risk AS (
  SELECT t, d,
         CAST(sum(n_end) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk
  FROM offsets
)
SELECT t, d, n_at_risk,
       round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk))
                 OVER (ORDER BY t)), 6) AS survival
FROM risk
"""


@register(
    "kaplan_meier_weekly",
    _KM_ORACLE,
    doc="Kaplan-Meier weekly survival of user activity (last active week "
    "= event unless right-censored at the corpus edge): per-user reduce "
    "then offset-bounded risk table; cumulative product via order-"
    "pinned log-sum window over ~weeks rows",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    week = F.date_trunc("week", F.col("ts"))
    maxw = ev.agg(F.date_trunc("week", F.max("ts")).alias("corpus_max_w"))
    peru = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("week", F.min("ts")).alias("w0"),
            F.date_trunc("week", F.max("ts")).alias("w1"),
        )
        .crossJoin(F.broadcast(maxw))
        .select(
            F.floor(
                (F.unix_micros(F.col("w1").cast("timestamp"))
                 - F.unix_micros(F.col("w0").cast("timestamp")))
                / F.lit(7 * 86400 * 1_000_000)
            ).alias("t"),
            (F.col("w1") == F.col("corpus_max_w")).alias("censored"),
        )
    )
    offsets = peru.groupBy("t").agg(
        F.count("*").alias("n_end"),
        F.count(F.when(~F.col("censored"), 1)).alias("d"),
    )
    back = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = offsets.select(
        "t", "d", F.sum("n_end").over(back).cast("long").alias("n_at_risk")
    )
    surv = F.exp(
        F.sum(F.log(1.0 - F.col("d").cast("double") / F.col("n_at_risk"))).over(fwd)
    )
    return risk.select("t", "d", "n_at_risk", F.round(surv, 6).alias("survival"))


# -- longest consecutive-day activity streak ----------------------------------

# Gaps-and-islands on (user, active day) — the same islands shape as
# the checkpoint completed-ranges operator (operators/islands.py),
# applied to engagement: day_number - dense_rank is constant within a
# consecutive run.  Output: each user's longest streak.

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_ms(date_trunc('day', ts)) / 86400000) AS BIGINT)
           AS dayno
  FROM events
),
runs AS (
  SELECT user_id, dayno,
         dayno - row_number() OVER (PARTITION BY user_id ORDER BY dayno)
           AS grp
  FROM days
),
streaks AS (
  SELECT user_id, count(*) AS len FROM runs GROUP BY user_id, grp
)
SELECT user_id, max(len) AS longest_streak_days
FROM streaks GROUP BY user_id
"""


@register(
    "longest_daily_streak",
    _STREAK_ORACLE,
    doc="longest consecutive-active-day streak per user: gaps-and-"
    "islands (dayno - row_number constant within a run) over distinct "
    "(user, day) — per-user windows over bounded day counts, the "
    "engagement twin of the completed-ranges operator",
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dayno = F.floor(
        F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000)
    ).cast("long")
    days = ev.select("user_id", dayno.alias("dayno")).distinct()
    w = Window.partitionBy("user_id").orderBy("dayno")
    runs = days.select(
        "user_id", "dayno", (F.col("dayno") - F.row_number().over(w)).alias("grp")
    )
    streaks = runs.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak_days")
    )


# -- autocorrelation function of the daily volume series --------------------

# ACF at lags 1..7 over the corpus-wide daily event-count series:
# r_k = sum((c_t - mean)(c_{t+k} - mean)) / sum((c_t - mean)^2), pairs
# taken only where both calendar days observed.  No window at all —
# the lagged series is an equi-join of the bounded daily table with
# itself on (dayno + lag), so there is never a global sort; the mean /
# sum-of-squares stats are a 1-row broadcast.  avg of exact integer
# counts divides once, so devs are bit-identical across engines; the
# final round absorbs parallel summation order.

_ACF_ORACLE = """
WITH daily AS (
  SELECT CAST(floor(epoch_ms(date_trunc('day', ts)) / 86400000) AS BIGINT)
           AS dayno,
         count(*) AS cnt
  FROM events GROUP BY 1
),
m AS (SELECT avg(cnt) AS mean_c FROM daily),
dev AS (SELECT dayno, cnt - m.mean_c AS dev FROM daily CROSS JOIN m),
ssq AS (SELECT sum(dev * dev) AS ss FROM dev),
lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
pairs AS (
  SELECT l.lag, a.dev * b.dev AS prod
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON b.dayno = a.dayno + l.lag
)
SELECT lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum(prod) / any_value(ss), 6) AS acf
FROM pairs CROSS JOIN ssq
GROUP BY lag
"""


@register(
    "acf_daily_counts",
    _ACF_ORACLE,
    doc="autocorrelation of the corpus-wide daily event-count series "
    "at lags 1..7 — lagged pairs via equi-join on (dayno + lag) over "
    "the bounded daily table (no global-sort window); mean/SS stats "
    "broadcast as a 1-row table",
)
def q_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dayno = F.floor(
        F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000)
    ).cast("long")
    # daily is #days-bounded: persist eagerly so the four consumers
    # (stats broadcast, ss, both lag-join sides) read the cached table
    # instead of each re-running the corpus count scan
    daily = ev.groupBy(dayno.alias("dayno")).agg(F.count("*").alias("cnt")).persist()
    daily.count()
    stats = daily.agg(F.avg("cnt").alias("mean_c"))
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "dayno", (F.col("cnt") - F.col("mean_c")).alias("dev")
    )
    # ss from the same dev projection both engines divide by
    ss = dev.agg(F.sum(F.col("dev") * F.col("dev")).alias("ss"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = dev.crossJoin(F.broadcast(lags))
    b = dev.select(F.col("dayno").alias("dayno_b"), F.col("dev").alias("dev_b"))
    pairs = a.join(
        b, F.col("dayno_b") == F.col("dayno") + F.col("lag")
    ).select("lag", (F.col("dev") * F.col("dev_b")).alias("prod"))
    return (
        pairs.groupBy("lag")
        .agg(F.count("*").cast("long").alias("n_pairs"), F.sum("prod").alias("sp"))
        .crossJoin(F.broadcast(ss))
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("sp") / F.col("ss"), 6).alias("acf"),
        )
    )


# -- CUSUM changepoint detection per event type -----------------------------

# Classic CUSUM: per type, the running sum of (daily count - series
# mean); the day where |CUSUM| peaks is the most likely level-shift
# point.  The cumulative window is per-type over the BOUNDED calendar
# day series (never raw events); both engines fold it in the same day
# order, and the mean divides an exact integer sum, so the cusum is
# bit-identical before the final round.

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch_ms(date_trunc('day', ts)) / 86400000) AS BIGINT)
           AS dayno,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (SELECT event_type, avg(cnt) AS mean_c FROM daily GROUP BY 1),
cusum AS (
  SELECT d.event_type, d.dayno,
         sum(d.cnt - s.mean_c) OVER (PARTITION BY d.event_type
                                     ORDER BY d.dayno) AS cum
  FROM daily d JOIN stats s ON s.event_type = d.event_type
)
SELECT event_type, dayno AS change_day, round(cum, 6) AS peak_cusum
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(cum) DESC, dayno) AS rn
  FROM cusum
) WHERE rn = 1
"""


@register(
    "cusum_changepoint",
    _CUSUM_ORACLE,
    doc="CUSUM level-shift detection per event type: running sum of "
    "(daily count - series mean) over the bounded per-type day series, "
    "peak-|CUSUM| day via partial-agg max_by (earliest-day tie-break) "
    "— the window is per type over calendar days, never raw events",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dayno = F.floor(
        F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
        / F.lit(86400000)
    ).cast("long")
    daily = ev.groupBy("event_type", dayno.alias("dayno")).agg(
        F.count("*").alias("cnt")
    )
    stats = daily.groupBy("event_type").agg(F.avg("cnt").alias("mean_c"))
    w = Window.partitionBy("event_type").orderBy("dayno")
    cusum = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "dayno",
        F.sum(F.col("cnt") - F.col("mean_c")).over(w).alias("cum"),
    )
    key = F.struct(F.abs("cum").alias("a"), (-F.col("dayno")).alias("nd"))
    return cusum.groupBy("event_type").agg(
        F.max_by("dayno", key).alias("change_day"),
        F.round(F.max_by("cum", key), 6).alias("peak_cusum"),
    )
