"""Window functions, frames, grouping sets, and the range-join query.

SURVEY §2.0 records the reference has NO window functions, frames,
grouping sets, or range joins — MongoDB-delegated queries can't
express them. These close that gap with Spark built-ins, each
hash-checked against DuckDB.

Determinism: every window ORDER BY ends in a unique key (event_id) so
frame contents are identical across engines; float aggregates are
rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.operators.range_join import bucketed_range_join
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# -- lag/lead: inter-event gap per user -------------------------------------

_LAG_ORACLE = """
SELECT event_id, user_id,
       epoch_ms(ts) - epoch_ms(lag(ts) OVER w)  AS ms_since_prev,
       lead(event_type) OVER w                  AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY user_id < 200
"""


@register("lag_lead_gaps", _LAG_ORACLE, doc="lag/lead window: inter-event gaps per user")
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn(
            "ms_since_prev",
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.lag("ts").over(w).cast("timestamp")),
        )
        .withColumn("next_event_type", F.lead("event_type").over(w))
        .filter(F.col("user_id") < 200)
        .select("event_id", "user_id", "ms_since_prev", "next_event_type")
    )


# -- row frame: moving average over last 4 events per type ------------------

_MOVAVG_ORACLE = """
SELECT event_id, event_type,
       round(avg(value) OVER (PARTITION BY event_type ORDER BY event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg
FROM events
QUALIFY event_id < 5000
"""


@register(
    "moving_average",
    _MOVAVG_ORACLE,
    doc="ROWS frame: 4-row moving average per event type",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        _events(spark, sf_dir)
        .withColumn("moving_avg", F.round(F.avg("value").over(w), 4))
        .filter(F.col("event_id") < 5000)
        .select("event_id", "event_type", "moving_avg")
    )


# -- unbounded frame: running total per user --------------------------------

_CUMSUM_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_value
FROM events
QUALIFY user_id < 100
"""


@register(
    "running_total",
    _CUMSUM_ORACLE,
    doc="UNBOUNDED PRECEDING frame: per-user running total",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROWS (not the default RANGE) frame: deterministic under the
    # unique event_id ordering and matches the oracle exactly
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _events(spark, sf_dir)
        .withColumn("running_value", F.round(F.sum("value").over(w), 4))
        .filter(F.col("user_id") < 100)
        .select("event_id", "user_id", "running_value")
    )


# -- GROUPING SETS (beyond cube/rollup: arbitrary subtotal combos) ----------

# join fabric: doc_id is UNIQUE, so `event_id % 5000 = doc_id` matches
# each event to AT MOST one document — output stays O(|events|) at any
# scale.  The previous `% 1000 = doc_id % 1000` many-to-many fabric had
# per-key fan-out (events/1000)x(docs/1000): quadratic growth the 10x
# rehearsal measured at 28x.
_GSETS_ORACLE = """
SELECT event_type, lang, count(*) AS n, round(sum(value), 2) AS sum_value
FROM (SELECT e.event_type, d.lang, e.value
      FROM events e JOIN documents d ON e.event_id % 5000 = d.doc_id)
GROUP BY GROUPING SETS ((event_type), (lang), (event_type, lang))
"""


@register(
    "grouping_sets_agg",
    _GSETS_ORACLE,
    doc="GROUPING SETS: explicit subtotal combinations (beyond cube/rollup)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = ev.join(
        docs, ev.event_id % 5000 == docs.doc_id
    ).select("event_type", "lang", "value")
    view = "gsets_input"
    joined.createOrReplaceTempView(view)
    return joined.sparkSession.sql(
        f"""
        SELECT event_type, lang, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM {view}
        GROUP BY GROUPING SETS ((event_type), (lang), (event_type, lang))
        """
    )


# -- range join: events into overlapping 48h windows ------------------------

_N_WINDOWS = 30
_WIN_START = "2024-01-01 00:00:00"
_DAY_US = 86_400_000_000

_RANGE_ORACLE = f"""
WITH ranges AS (
  SELECT i AS win_id,
         TIMESTAMP '{_WIN_START}' + to_days(CAST(i AS INT))     AS lo,
         TIMESTAMP '{_WIN_START}' + to_days(CAST(i + 2 AS INT)) AS hi
  FROM generate_series(0, {_N_WINDOWS - 1}) t(i))
SELECT r.win_id, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
FROM ranges r JOIN events e ON e.ts >= r.lo AND e.ts < r.hi
GROUP BY r.win_id
"""


@register(
    "range_join_windows",
    _RANGE_ORACLE,
    doc="bucketed range join: events into overlapping 48h/24h-slide windows "
    "(equi-bucket strategy, no nested-loop join)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "value"
    )
    ranges = spark.range(_N_WINDOWS).select(
        F.col("id").alias("win_id"),
        (
            F.unix_micros(F.to_timestamp(F.lit(_WIN_START)))
            + F.col("id") * _DAY_US
        ).alias("lo_us"),
        (
            F.unix_micros(F.to_timestamp(F.lit(_WIN_START)))
            + (F.col("id") + 2) * _DAY_US
        ).alias("hi_us"),
    )
    joined = bucketed_range_join(
        ev,
        ranges,
        point_col="ts_us",
        lo_col="lo_us",
        hi_col="hi_us",
        bucket_width=_DAY_US,
        broadcast_ranges=True,
    )
    return joined.groupBy("win_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# -- ranking-family windows: ntile / percent_rank / cume_dist ---------------
#
# The remaining ranking window family the reference can't express.
# Ties are killed by the (value, event_id) compound order key — ntile
# bucket boundaries and percent_rank are tie-sensitive, so a unique
# suffix is a cross-engine CORRECTNESS requirement, not a nicety.
# The window partitions by event_type (bounded cardinality), so the
# shuffle is the per-type repartition a 100 TB run wants anyway; no
# single-partition global window.

_NTILE_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
)
SELECT event_type, quartile,
       count(*) AS n,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value,
       round(avg(pr), 6) AS avg_pct_rank,
       round(max(cd), 6) AS max_cume_dist
FROM ranked
GROUP BY event_type, quartile
"""


@register(
    "ntile_quartile_stats",
    _NTILE_ORACLE,
    doc="ranking windows: ntile(4)/percent_rank/cume_dist per event_type "
    "with tie-proof compound order key; per-quartile value stats",
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = _events(spark, sf_dir).select(
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.avg("pr"), 6).alias("avg_pct_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )


# -- RANGE interval frame (value-bounded, not row-bounded) -------------------
#
# The remaining frame type: RANGE frames bound the window by ORDER-KEY
# VALUE (here: all of the user's events in the trailing 24 h), not by
# row count — the "trailing window metric" shape rate limiters and
# rolling SLO dashboards need.  RANGE frames are tie-DETERMINISTIC by
# construction (every row with an in-bound key is in the frame), so
# unlike the ranking windows no unique suffix key is needed.  The
# order key is the NTZ-epoch in µs — numeric, so both engines bound
# the frame with plain arithmetic.

_TRAIL_US = 86_400_000_000  # 24 h

# The frame aggregate runs over INTEGER CENTS, not doubles: a running
# double sum folds in engine-specific order and can land exactly on a
# round() boundary (observed at sf0.01).  Integer window sums are
# exact in both engines, so the derived average is bit-identical;
# the 4-decimal TRUNCATION (floor) replaces round() because the
# quotient grid (1/100n) lands exactly on round-half boundaries where
# the engines' decimal-vs-binary rounding disagrees — floor of an
# identical IEEE double is unambiguous.
_RANGE_FRAME_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < 200
)
SELECT user_id, event_id,
       n_24h,
       floor(CAST(sum_cents AS DOUBLE) * 100 / n_24h) / 10000 AS avg_24h
FROM (
  SELECT user_id, event_id,
         count(*) OVER w AS n_24h,
         CAST(sum(cents) OVER w AS BIGINT) AS sum_cents
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us
               RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
)
"""


@register(
    "trailing_24h_window",
    _RANGE_FRAME_ORACLE,
    doc="RANGE interval frame: per-user trailing-24h count/avg bounded by "
    "order-key value (tie-deterministic by construction); partitioned "
    "window, user filter pushed to the scan",
)
def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 200).select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        epoch_us.alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-_TRAIL_US, 0)
    )
    framed = ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_24h"),
        F.sum("cents").over(w).alias("sum_cents"),
    )
    return framed.select(
        "user_id",
        "event_id",
        "n_24h",
        (
            F.floor(F.col("sum_cents").cast("double") * 100 / F.col("n_24h"))
            / 10000
        ).alias("avg_24h"),
    )
