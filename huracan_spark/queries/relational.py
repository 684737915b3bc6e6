"""Widened relational coverage (SURVEY §2.0 deliberate-absence ledger).

The reference has none of these — no windows, grouping sets, set ops,
or as-of semantics — and SURVEY §2.0 notes Spark built-ins cover every
gap "if we later widen the query surface".  This module is that
widening, each construct oracle-checked: event-time tumbling windows,
session windows (gap-based), ROLLUP aggregation, set operations, and
the as-of join operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.operators.asof import asof_join
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# -- tumbling event-time windows -------------------------------------------

_TUMBLING_ORACLE = """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register(
    "tumbling_window_agg",
    _TUMBLING_ORACLE,
    doc="event-time tumbling window aggregation (1h) — streaming-agg shape in batch",
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# -- session windows (gap-based sessionization) -----------------------------

_SESSION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, count(*) AS n_events,
       epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
FROM numbered GROUP BY user_id, session_id
"""


@register(
    "session_windows",
    _SESSION_ORACLE,
    doc=f"session windows: {SESSION_GAP_MIN}-minute-gap sessionization per user",
)
def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("_new", new_session)
        .withColumn("session_id", F.sum("_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_millis(F.min("ts").cast("timestamp")).alias("start_ms"),
            F.unix_millis(F.max("ts").cast("timestamp")).alias("end_ms"),
        )
    )


# -- ROLLUP -----------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, user_id % 10)
"""


@register(
    "rollup_agg",
    _ROLLUP_ORACLE,
    doc="ROLLUP grouping sets (subtotals + grand total)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


# -- set operations ---------------------------------------------------------

_SETOPS_ORACLE = """
SELECT user_id, epoch_ms(date_trunc('day', ts)) AS day_ms
FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, epoch_ms(date_trunc('day', ts))
FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, epoch_ms(date_trunc('day', ts))
FROM events WHERE event_type = 'error'
"""


@register(
    "set_ops",
    _SETOPS_ORACLE,
    doc="INTERSECT/EXCEPT set operations ((user, day) granularity)",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def days(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select(
            "user_id",
            F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp")).alias(
                "day_ms"
            ),
        )

    return days("click").intersect(days("purchase")).subtract(days("error"))


# -- as-of join -------------------------------------------------------------

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ts_ms,
       epoch_ms(c.ts) AS click_ts_ms,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register(
    "asof_join_purchases",
    _ASOF_ORACLE,
    doc="as-of join: most recent prior click for each purchase (union+window, no range cross-join)",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="c_ts",
        right_cols=["c_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.unix_millis(F.col("c_ts_asof").cast("timestamp")).alias("click_ts_ms"),
        F.col("c_value_asof").alias("click_value"),
    )


# -- as-of join: outer semantics pinned -------------------------------------
#
# Same operator, but the right side only starts mid-range, so every
# early purchase has NO prior qualifying click: the driver hash now
# pins the left-outer null-emission contract of operators/asof.py
# (all left rows survive; carried columns are null before the first
# right row), not just the matched path that asof_join_purchases
# exercises.

_ASOF_CUTOFF = "2024-01-15 00:00:00"

_ASOF_OUTER_ORACLE = f"""
SELECT p.event_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ts_ms,
       epoch_ms(c.ts) AS click_ts_ms,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events
                WHERE event_type = 'click'
                  AND ts >= TIMESTAMP '{_ASOF_CUTOFF}') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register(
    "asof_join_outer_nulls",
    _ASOF_OUTER_ORACLE,
    doc="as-of join with guaranteed unmatched left rows (right side starts "
    "mid-range): pins the left-outer null-carry semantics in the driver hash",
)
def q_asof_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(
        (F.col("event_type") == "click") & (F.col("ts") >= _ASOF_CUTOFF)
    ).select("user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value"))
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="c_ts",
        right_cols=["c_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.unix_millis(F.col("c_ts_asof").cast("timestamp")).alias("click_ts_ms"),
        F.col("c_value_asof").alias("click_value"),
    )


# -- conversion funnel (range join reuse) -----------------------------------
#
# Classic funnel analytics: a click CONVERTS if the same user purchases
# within the attribution window.  The naive formulation is a
# time-range non-equi join (BroadcastNestedLoopJoin — dies at scale);
# this reuses operators/range_join.py with (user_id, time-bucket) as
# the compound equi-key, so purchases only ever meet the SAME user's
# clicks in overlapping hour buckets.

FUNNEL_WINDOW_MS = 3_600_000  # 1 h attribution

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

_FUNNEL_ORACLE = f"""
WITH c AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms,
         epoch_ms(date_trunc('day', ts)) AS day_ms
  FROM events WHERE event_type = 'click'
),
p AS (SELECT user_id, epoch_ms(ts) AS pms FROM events
      WHERE event_type = 'purchase'),
conv AS (
  SELECT DISTINCT c.event_id, c.day_ms
  FROM c JOIN p ON p.user_id = c.user_id
   AND p.pms >= c.ms AND p.pms < c.ms + {FUNNEL_WINDOW_MS}
),
cd AS (SELECT day_ms, count(*) AS n_clicks FROM c GROUP BY 1),
vd AS (SELECT day_ms, count(*) AS n_converted FROM conv GROUP BY 1)
SELECT cd.day_ms, cd.n_clicks,
       coalesce(vd.n_converted, 0) AS n_converted,
       round(CAST(coalesce(vd.n_converted, 0) AS DOUBLE) / cd.n_clicks, 6)
         AS conversion_rate
FROM cd LEFT JOIN vd USING (day_ms)
"""


@register(
    "click_purchase_funnel",
    _FUNNEL_ORACLE,
    doc="per-day click->purchase conversion within a 1 h window — the "
    "time-range join runs as a bucketed (user, hour-bucket) equi-join "
    "(operators/range_join.py), never a nested loop",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.range_join import bucketed_range_join

    ev = _events(spark, sf_dir)
    ms = F.expr(f"timestampdiff(MILLISECOND, {_EPOCH_NTZ}, ts)")
    day_ms = F.expr(
        f"timestampdiff(MILLISECOND, {_EPOCH_NTZ}, date_trunc('day', ts))"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        ms.alias("lo"),
        (ms + FUNNEL_WINDOW_MS).alias("hi"),
        day_ms.alias("day_ms"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", ms.alias("pms")
    )
    conv = (
        bucketed_range_join(
            purchases,
            clicks,
            point_col="pms",
            lo_col="lo",
            hi_col="hi",
            bucket_width=FUNNEL_WINDOW_MS,
            extra_keys=("user_id",),
        )
        .select("event_id", "day_ms")
        .distinct()
    )
    cd = clicks.groupBy("day_ms").agg(F.count("*").alias("n_clicks"))
    vd = conv.groupBy("day_ms").agg(F.count("*").alias("n_converted"))
    n_conv = F.coalesce(F.col("n_converted"), F.lit(0))
    return cd.join(vd, "day_ms", "left").select(
        "day_ms",
        "n_clicks",
        n_conv.alias("n_converted"),
        F.round(n_conv.cast("double") / F.col("n_clicks"), 6).alias(
            "conversion_rate"
        ),
    )


# -- cohort retention --------------------------------------------------------
#
# The other canonical product-analytics query: users cohorted by
# signup week; retention = share of the cohort with ANY activity in
# each later week.  Shape: one small cohort table (distinct users) +
# one activity-week table (distinct (user, week)), joined on user —
# both deduplicated BEFORE the join so the fan-out is
# |users| x |active weeks per user|, never event x event.

_RETENTION_ORACLE = """
WITH s AS (
  SELECT user_id, min(epoch_ms(date_trunc('week', ts))) AS cohort_ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, epoch_ms(date_trunc('week', ts)) AS week_ms
  FROM events
),
sizes AS (SELECT cohort_ms, count(*) AS n_cohort FROM s GROUP BY 1),
hits AS (
  SELECT s.cohort_ms,
         CAST((a.week_ms - s.cohort_ms) / 604800000 AS BIGINT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM s JOIN a ON a.user_id = s.user_id AND a.week_ms >= s.cohort_ms
  GROUP BY 1, 2
)
SELECT h.cohort_ms, h.week_offset, z.n_cohort, h.n_active,
       round(CAST(h.n_active AS DOUBLE) / z.n_cohort, 6) AS retention
FROM hits h JOIN sizes z ON z.cohort_ms = h.cohort_ms
"""


@register(
    "cohort_retention",
    _RETENTION_ORACLE,
    doc="weekly cohort retention: signup-week cohorts x activity-week "
    "offsets; both join sides pre-deduplicated so the join is "
    "users x active-weeks, never event x event",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    week_ms = F.expr(
        "timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " date_trunc('week', ts))"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", week_ms.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_ms"))
    )
    a = ev.select("user_id", week_ms.alias("week_ms")).distinct()
    sizes = s.groupBy("cohort_ms").agg(F.count("*").alias("n_cohort"))
    hits = (
        s.join(a, "user_id")
        .filter(F.col("week_ms") >= F.col("cohort_ms"))
        .groupBy(
            "cohort_ms",
            ((F.col("week_ms") - F.col("cohort_ms")) / 604800000)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return hits.join(F.broadcast(sizes), "cohort_ms").select(
        "cohort_ms",
        "week_offset",
        "n_cohort",
        "n_active",
        F.round(F.col("n_active").cast("double") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )


# -- as-of join, FORWARD direction ------------------------------------------
#
# The attribution mirror image: the next click AT OR AFTER each
# purchase (post-purchase engagement).  Same single-window operator
# plan with time reversed (operators/asof.py direction="forward");
# DuckDB's ASOF infers the direction from the >= inequality, so the
# oracle pins forward semantics including the no-next-click nulls at
# the range tail.

_ASOF_FWD_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ts_ms,
       epoch_ms(c.ts) AS next_click_ts_ms,
       c.value AS next_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts >= p.ts
"""


@register(
    "asof_join_forward",
    _ASOF_FWD_ORACLE,
    doc="forward as-of join: earliest click at-or-after each purchase "
    "(same union+window plan, time reversed — no range cross-join)",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="c_ts",
        right_cols=["c_value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.unix_millis(F.col("c_ts_asof").cast("timestamp")).alias(
            "next_click_ts_ms"
        ),
        F.col("c_value_asof").alias("next_click_value"),
    )


# -- hopping (sliding) event-time windows -----------------------------------

# 1-hour windows every 30 minutes: each event lands in exactly two
# overlapping windows.  This is Spark's native sliding `window()` —
# the oracle reproduces the assignment by exploding the two candidate
# starts per event (the generic form unnests window_len/slide starts).

_HOPPING_ORACLE = """
WITH assigned AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
           AS window_start
  FROM events
)
SELECT epoch_ms(window_start) AS window_start_ms,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM assigned
GROUP BY 1, 2
"""


@register(
    "hopping_window_agg",
    _HOPPING_ORACLE,
    doc="hopping (sliding) event-time windows — 1h length, 30min slide, "
    "each event in exactly window/slide = 2 windows; Spark's native "
    "sliding window() operator, partial-agg combined before the "
    "(window, type) shuffle",
)
def q_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# -- unpivot / melt ----------------------------------------------------------

# Wide-to-long reshaping with EXACT integer-cents sums (double sums
# fold-order-drift across engines; cents are associative).

_MELT_ORACLE = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS quantity,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price,
         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS discount,
         CAST(sum(CAST(round(l_tax * 100) AS BIGINT)) AS BIGINT) AS tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'quantity' AS metric, quantity AS value_cents FROM wide
UNION ALL
SELECT l_returnflag, 'price', price FROM wide
UNION ALL
SELECT l_returnflag, 'discount', discount FROM wide
UNION ALL
SELECT l_returnflag, 'tax', tax FROM wide
"""


@register(
    "lineitem_metrics_melt",
    _MELT_ORACLE,
    doc="unpivot/melt: wide per-flag measure columns reshaped to "
    "(flag, metric, value) rows via DataFrame.unpivot — the reshape "
    "happens AFTER the aggregate, so the melt multiplies a "
    "|flags|-sized table, never the fact scan; sums are exact integer "
    "cents (associative, engine-order-proof)",
)
def q_lineitem_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def cents(c: str):
        return F.sum(F.round(F.col(c) * 100).cast("long")).cast("long")

    wide = li.groupBy("l_returnflag").agg(
        cents("l_quantity").alias("quantity"),
        cents("l_extendedprice").alias("price"),
        cents("l_discount").alias("discount"),
        cents("l_tax").alias("tax"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["quantity", "price", "discount", "tax"],
        "metric",
        "value_cents",
    )


# -- market-basket co-purchase pairs -----------------------------------------

# Support + lift over part pairs sharing an order.  The self-join fans
# out per order by (lines-per-order choose 2) — bounded by the order
# line cap, NOT corpus size — and is hash-partitioned on the order key;
# the per-part order counts broadcast back for the lift ratio.

BASKET_MIN_SUPPORT = 2

_COPURCHASE_ORACLE = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM lp),
part_freq AS (SELECT l_partkey, count(*) AS n_p FROM lp GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT p.part_a, p.part_b, p.support,
       round(CAST(p.support AS DOUBLE) * n_orders.n
             / (fa.n_p * fb.n_p), 6) AS lift
FROM pairs p
JOIN part_freq fa ON p.part_a = fa.l_partkey
JOIN part_freq fb ON p.part_b = fb.l_partkey
CROSS JOIN n_orders
"""


# The co-purchase graph is shared per (applicationId, sf_dir) like the
# dedup label tables: `lp` (the distinct order->part incidence) and
# `pairs` (part pairs co-occurring in >= BASKET_MIN_SUPPORT orders)
# are THE market-basket artifact — copurchase_pairs reports on it and
# related_parts_ppr random-walks over it, exactly the two consumers a
# deployment would point at one materialized graph.  The one-time
# build (distinct + order-bounded self-join + pair count) is charged
# to the `basket:pairs` GROUP via matcost.
_SF_BASKET: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def basket_pairs_shared(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(lp, pairs): lp = distinct (l_orderkey, l_partkey); pairs =
    (x, y, n) with x < y and n >= BASKET_MIN_SUPPORT co-orders.
    Both eagerly localCheckpointed (they survive bench cache hygiene
    as RDD blocks, and the self-join reads lp on both sides without
    recompute)."""
    from huracan_spark.queries.matcost import charged_build

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SF_BASKET.get(key)
    if cached is None:
        with charged_build("basket:pairs"):
            lp = (
                load_table(spark, sf_dir, "lineitem")
                .select("l_orderkey", "l_partkey")
                .distinct()
                .localCheckpoint(eager=True)
            )
            a, b = lp.alias("a"), lp.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")),
                )
                .groupBy(
                    F.col("a.l_partkey").alias("x"),
                    F.col("b.l_partkey").alias("y"),
                )
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") >= BASKET_MIN_SUPPORT)
                .localCheckpoint(eager=True)
            )
        cached = (lp, pairs)
        _SF_BASKET[key] = cached
    return cached


@register(
    "copurchase_pairs",
    _COPURCHASE_ORACLE,
    doc=f"market-basket analysis: part pairs co-occurring in >= "
    f"{BASKET_MIN_SUPPORT} orders with lift = P(a,b)/(P(a)P(b)). "
    "Self-join fan-out bounded by lines-per-order (never corpus-"
    "quadratic), hash-partitioned on the order key; per-part "
    "frequencies broadcast for the lift ratio",
)
def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    lp, pairs = basket_pairs_shared(spark, sf_dir)
    n_orders = lp.agg(F.countDistinct("l_orderkey").alias("n"))
    part_freq = lp.groupBy("l_partkey").agg(F.count("*").alias("n_p"))
    pairs = pairs.select(
        F.col("x").alias("part_a"),
        F.col("y").alias("part_b"),
        F.col("n").alias("support"),
    )
    fa = part_freq.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("na"))
    fb = part_freq.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("nb"))
    lift = F.col("support").cast("double") * F.col("n") / (F.col("na") * F.col("nb"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select("part_a", "part_b", "support", F.round(lift, 6).alias("lift"))
    )


# -- decile lift / gains table -----------------------------------------------

# The scale-safe ntile alternative: a global ntile() needs a
# SinglePartition window over every customer; instead the 9 decile
# BOUNDARIES are computed with one exact-percentile aggregate (doubles
# identical cross-engine on integer-cents input), broadcast, and each
# row buckets itself locally.  The cumulative pass runs over the
# 10-row decile table only.

_LIFT_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
bounds AS (
  SELECT quantile_cont(cents, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           AS bs
  FROM spend
),
bucketed AS (
  SELECT s.cents,
         len(list_filter(bounds.bs, b -> s.cents > b)) AS decile
  FROM spend s CROSS JOIN bounds
),
dec AS (
  SELECT decile, count(*) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents
  FROM bucketed GROUP BY decile
),
tot AS (SELECT CAST(sum(total_cents) AS BIGINT) AS grand FROM dec)
SELECT d.decile, d.n_customers, d.total_cents,
       round(CAST(d.total_cents AS DOUBLE) / tot.grand, 6) AS share,
       round(CAST(sum(d.total_cents)
                  OVER (ORDER BY d.decile DESC) AS DOUBLE) / tot.grand, 6)
         AS cum_share_from_top
FROM dec d CROSS JOIN tot
"""


@register(
    "customer_decile_lift",
    _LIFT_ORACLE,
    doc="decile gains table over customer spend WITHOUT a global ntile "
    "window: 9 exact-percentile boundaries broadcast, rows bucket "
    "locally, cumulative share computed over the 10-row decile table — "
    "the SinglePartition-free form of the marketing lift report",
)
def q_customer_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    bounds = spend.agg(
        F.percentile("cents", F.lit([i / 10.0 for i in range(1, 10)])).alias("bs")
    )
    bucketed = spend.crossJoin(F.broadcast(bounds)).select(
        "cents",
        F.size(F.filter(F.col("bs"), lambda b: F.col("cents") > b)).alias("decile"),
    )
    dec = bucketed.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    tot = dec.agg(F.sum("total_cents").cast("long").alias("grand"))
    cum = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "total_cents",
            F.round(F.col("total_cents").cast("double") / F.col("grand"), 6).alias(
                "share"
            ),
            F.round(
                F.sum("total_cents").over(cum).cast("double") / F.col("grand"), 6
            ).alias("cum_share_from_top"),
        )
    )


# -- absence detection: unresolved errors ------------------------------------

# "A not followed by B within T" — the alerting primitive.  The
# existence probe reuses the bucketed range join (operators/
# range_join.py) riding (user, time-bucket) equi-keys, then errors
# with a matching follow-up are subtracted with a broadcast-size anti
# join on the error id — never a per-row correlated subquery and never
# a time-predicate nested loop.

RESOLVE_WINDOW_US = 3_600_000_000  # 1 hour

_UNRESOLVED_ORACLE = f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
resolved AS (
  SELECT DISTINCT e.event_id
  FROM err e JOIN events c
    ON c.user_id = e.user_id AND c.event_type = 'click'
   AND epoch_us(c.ts) > epoch_us(e.ts)
   AND epoch_us(c.ts) < epoch_us(e.ts) + {RESOLVE_WINDOW_US}
)
SELECT e.user_id,
       count(*) AS n_errors,
       count(*) FILTER (WHERE r.event_id IS NULL) AS n_unresolved
FROM err e LEFT JOIN resolved r ON e.event_id = r.event_id
GROUP BY e.user_id
"""


@register(
    "unresolved_errors",
    _UNRESOLVED_ORACLE,
    doc="absence-within-window detection (error with no click inside the "
    "following hour, per user): bucketed range join on (user, "
    "time-bucket) finds resolutions, an anti join on the error id "
    "subtracts them — no correlated subquery, no nested-loop time "
    "predicate",
)
def q_unresolved_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.range_join import bucketed_range_join

    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id"),
        us.alias("lo"),
        (us + RESOLVE_WINDOW_US).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), us.alias("c_us")
    )
    matched = bucketed_range_join(
        clicks,
        err,
        point_col="c_us",
        lo_col="lo",
        hi_col="hi",
        bucket_width=RESOLVE_WINDOW_US,
        extra_keys=("user_id",),
    )
    resolved = (
        matched.filter(F.col("c_us") > F.col("lo")).select("err_id").distinct()
    )
    unresolved = err.join(resolved, "err_id", "left_anti")
    n_unres = err.join(resolved.withColumn("_r", F.lit(1)), "err_id", "left")
    return n_unres.groupBy("user_id").agg(
        F.count("*").alias("n_errors"),
        F.count(F.when(F.col("_r").isNull(), 1)).alias("n_unresolved"),
    )


# -- week-over-week growth ----------------------------------------------------

_WOW_ORACLE = """
WITH weekly AS (
  SELECT event_type, epoch_ms(date_trunc('week', ts)) AS week_ms,
         round(sum(value), 2) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, week_ms, total_value,
       round((total_value - lag(total_value)
              OVER (PARTITION BY event_type ORDER BY week_ms))
             / lag(total_value)
              OVER (PARTITION BY event_type ORDER BY week_ms), 6)
         AS wow_growth
FROM weekly
"""


@register(
    "weekly_value_wow",
    _WOW_ORACLE,
    doc="week-over-week growth per event type: weekly rollup first, lag "
    "window over the bounded (type, week) series only — the trend KPI "
    "without ever ordering raw events globally",
)
def q_weekly_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    week_ms = F.unix_millis(F.date_trunc("week", F.col("ts")).cast("timestamp"))
    weekly = ev.groupBy("event_type", week_ms.alias("week_ms")).agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy("week_ms")
    prev = F.lag("total_value").over(w)
    return weekly.select(
        "event_type",
        "week_ms",
        "total_value",
        F.round((F.col("total_value") - prev) / prev, 6).alias("wow_growth"),
    )
