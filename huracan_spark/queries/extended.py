"""Extended operator coverage: pivot, cube, semi/anti joins, typed JSON
extraction, exact percentiles, conditional aggregation, approximate
aggregates.

``approx_distinct_users`` is registered WITHOUT an oracle on purpose:
HyperLogLog sketches are engine-specific, so it takes the driver's
weaker rows-only check — the documented path for genuinely
non-SQL-reproducible ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import hash60_sql

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# -- pivot ------------------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events GROUP BY 1
"""


@register("pivot_counts", _PIVOT_ORACLE, doc="pivot: event-type counts to columns")
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    out = ev.groupBy("user_bucket").pivot("event_type", _EVENT_TYPES).count()
    # pivot leaves null for empty cells; the FILTER oracle yields 0
    return out.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# -- cube -------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_bucket, count(*) AS n
FROM events GROUP BY CUBE (event_type, user_id % 5)
"""


@register("cube_agg", _CUBE_ORACLE, doc="CUBE grouping sets (all subtotal combos)")
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("long")
    )
    return ev.cube("event_type", "user_bucket").agg(F.count("*").alias("n"))


# -- semi / anti joins ------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


@register("semi_join_big_spenders", _SEMI_ORACLE, doc="left-semi join (EXISTS)")
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("anti_join_no_orders", _ANTI_ORACLE, doc="left-anti join (NOT EXISTS)")
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# -- typed JSON extraction (Q11 / §1.4 option 2: from_json schema path) -----

_FROMJSON_ORACLE = """
SELECT event_id,
       CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_typed
FROM events WHERE event_id < 2000
"""


@register(
    "typed_json_extract",
    _FROMJSON_ORACLE,
    doc="from_json typed extraction (the per-package typed-view path, SURVEY §1.4)",
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select("event_id", parsed.getField("k").alias("k_typed"))


# -- exact percentiles (K9 latency-stat shape) ------------------------------

_PCTL_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type
"""


@register(
    "value_percentiles_per_type",
    _PCTL_ORACLE,
    doc="exact interpolated percentiles per group (K9 latency-stat shape)",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


# -- conditional aggregation ratio (TPC-H Q14 shape) ------------------------

_RATIO_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""


@register(
    "promo_revenue_share",
    _RATIO_ORACLE,
    doc="TPC-H Q14 shape: conditional-aggregation ratio over a join",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share")
        )
    )


# -- approximate aggregates (rows-only check BY DESIGN) ---------------------


@register(
    "approx_distinct_users",
    None,  # HLL sketches differ across engines -> driver rows-only check
    doc="approx_count_distinct (HLL); non-reproducible cross-engine, weaker check",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
    )


# -- skew-salted aggregation (driver-checked transparency proof) ------------

_SALTED_ORACLE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type
"""


@register(
    "salted_agg_per_type",
    _SALTED_ORACLE,
    doc="two-phase skew-salted aggregation — result identical to the "
    "plain GROUP BY (operators/salting.py; hot keys spread over 16 "
    "reducers before the final combine)",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.salting import salted_aggregate

    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    out = salted_aggregate(
        ev,
        ["event_type"],
        [("value", "count", "n"), ("value", "sum", "raw_sum"), ("value", "max", "raw_max")],
        n_salts=16,
        mix_cols=["event_id"],
    )
    return out.select(
        "event_type",
        F.col("n"),
        F.round("raw_sum", 2).alias("sum_value"),
        F.round("raw_max", 4).alias("max_value"),
    )


@register(
    "approx_value_quantiles",
    None,  # KLL/GK sketch internals differ across engines -> rows-only
    doc="approx_percentile (GK sketch) per event type; like the HLL "
    "query, sketch-based results are engine-specific by design. Scalar "
    "columns (not an array) so the driver's pandas canonicalizer can "
    "sort/hash the rows-only check.",
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10_000).alias("p50"),
            F.percentile_approx("value", 0.95, 10_000).alias("p95"),
            F.percentile_approx("value", 0.99, 10_000).alias("p99"),
        )
    )


# -- KMV distinct sketch (the hash-checkable approx-distinct twin) ----------
#
# approx_distinct_users is rows-only because HLL internals are
# engine-specific.  The K-minimum-values sketch (Bar-Yossef et al.
# 2002) has no such problem: its state is just the K smallest values
# of a shared hash — fully deterministic, mergeable (union = min-K of
# concatenated sketches), and exactly reproducible in SQL, so the
# driver can value-hash an APPROXIMATE cardinality estimator.
# Estimator: exact when fewer than K distinct hashes exist, else
# (K-1) * 2^60 / kth_min.
#
# Scale shape: the distinct pre-aggregation is a partial-agg'd group
# by (event_type, hash); the per-group min-K window then runs over
# distinct hashes only.  At extreme cardinality you'd pre-filter with
# a coarse threshold (hash < c*K*2^60/approx_count) before the exact
# window — the filter provably cannot change a min-K result that
# keeps >= K survivors.

KMV_K = 64

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {hash60_sql("user_id::VARCHAR", "kmv")} AS hv
  FROM events
),
ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_distinct
  FROM h
)
SELECT event_type,
       CAST(max(rn) AS BIGINT) AS sketch_size,
       max(hv) AS kth_min,
       CASE WHEN max(n_distinct) < {KMV_K}
            THEN CAST(max(n_distinct) AS DOUBLE)
            ELSE round(({KMV_K} - 1) * pow(2, 60) / max(hv), 2) END
         AS est_distinct
FROM ranked WHERE rn <= {KMV_K}
GROUP BY event_type
"""


@register(
    "kmv_distinct_users",
    _KMV_ORACLE,
    doc=f"K-minimum-values distinct sketch (K={KMV_K}) per event type — "
    "a mergeable cardinality estimator whose state is exactly "
    "reproducible cross-engine (unlike HLL), so approximate counting "
    "is value-hash-checked",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import hash60

    h = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            hash60(F.col("user_id").cast("string"), "kmv").alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    wc = Window.partitionBy("event_type")
    ranked = h.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_distinct", F.count("*").over(wc)
    )
    est = F.when(
        F.max("n_distinct") < KMV_K, F.max("n_distinct").cast("double")
    ).otherwise(F.round((KMV_K - 1) * F.pow(F.lit(2), 60) / F.max("hv"), 2))
    return (
        ranked.filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("rn").cast("long").alias("sketch_size"),
            F.max("hv").alias("kth_min"),
            est.alias("est_distinct"),
        )
    )


# -- skew-salted join (driver-checked transparency proof) -------------------

_SALTED_JOIN_ORACLE = """
SELECT c.c_nationkey AS nationkey, count(*) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@register(
    "salted_join_events_by_nation",
    _SALTED_JOIN_ORACLE,
    doc="skew-safe salted equi-join (operators/salting.py::salted_join): "
    "dimension replicated per salt, fact salted deterministically — "
    "result identical to the plain join, hot fact keys spread over 16 "
    "partitions",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.salting import salted_join

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("c_custkey"), "event_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(ev, cust, key="c_custkey", mix_cols=["event_id"])
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# -- sampled quantiles (the hash-checkable approx-quantile twin) ------------
#
# approx_value_quantiles stays rows-only (GK/KLL sketch internals are
# engine-specific).  This is the deterministic estimator: exact
# interpolated quantiles over a FIXED-RATE hash sample — the variate
# is hash60(event_id), so the sample (and therefore the estimate) is
# bit-identical across engines, runs, and retries.  At 100 TB the
# sample is |input| * rate rows; the quantile itself runs per group on
# the sampled subset only.

SAMPLE_RATE_PCT = 20  # keep ~20% of rows

_SAMPLED_Q_ORACLE = f"""
WITH s AS (
  SELECT event_type, value FROM events
  WHERE {hash60_sql("event_id::VARCHAR", "qsample")} % 100 < {SAMPLE_RATE_PCT}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_sampled,
       round(quantile_cont(value, 0.5), 4) AS p50_est,
       round(quantile_cont(value, 0.95), 4) AS p95_est
FROM s GROUP BY event_type
"""


@register(
    "sampled_value_quantiles",
    _SAMPLED_Q_ORACLE,
    doc=f"deterministic sampled quantiles: exact interpolated p50/p95 over "
    f"a {SAMPLE_RATE_PCT}% content-stable hash sample — reproducible "
    "cross-engine, unlike the rows-only GK/KLL sketch twin",
)
def q_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import hash60

    s = _events(spark, sf_dir).filter(
        hash60(F.col("event_id").cast("string"), "qsample") % 100 < SAMPLE_RATE_PCT
    )
    return s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_est"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_est"),
    )


# -- equi-width value histogram ---------------------------------------------
#
# The profiling primitive behind every "distribution drift" dashboard:
# fixed-width bins make the histogram MERGEABLE across shards and
# incremental batches (bin ids are content-derived, so partial
# histograms union by key) — unlike quantile sketches, no merge error.
# One scan, partial-agg counts; bin cardinality is bounded by
# range/width, so the shuffle is tiny regardless of corpus size.

HIST_BIN_WIDTH = 50.0

_HIST_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
       count(*) AS n,
       round(CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) * {HIST_BIN_WIDTH}, 2)
         AS bin_lo
FROM events
GROUP BY 1, 2
"""


@register(
    "value_histogram",
    _HIST_ORACLE,
    doc=f"equi-width histogram (width {HIST_BIN_WIDTH}) of value per "
    "event_type — mergeable across shards (content-derived bin ids), "
    "single scan, bounded bin cardinality",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    bin_ = F.floor(F.col("value") / HIST_BIN_WIDTH).cast("long")
    return (
        _events(spark, sf_dir)
        .groupBy("event_type", bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bin",
            "n",
            F.round(F.col("bin") * HIST_BIN_WIDTH, 2).alias("bin_lo"),
        )
    )


# -- per-group OLS trend ----------------------------------------------------
#
# Closed-form least-squares fit of value against event time per
# event_type — the "is this metric drifting" primitive.  Everything is
# moment sums (n, Σx, Σy, Σxy, Σx², Σy²), so the whole fit is ONE
# partial-aggregated scan: no window, no per-group iteration, no UDF —
# the shape that survives any scale.  x is days since a fixed literal
# anchor (not a per-group min, which would need a second pass) to keep
# the moment magnitudes small enough that the final round(6) sits far
# above double fold-order noise.

TREND_ANCHOR_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
_US_PER_DAY = 86_400_000_000.0

_TREND_ORACLE = f"""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         sum((epoch_us(ts) - {TREND_ANCHOR_US}) / {_US_PER_DAY}) AS sx,
         sum(value) AS sy,
         sum(((epoch_us(ts) - {TREND_ANCHOR_US}) / {_US_PER_DAY}) * value) AS sxy,
         sum(pow((epoch_us(ts) - {TREND_ANCHOR_US}) / {_US_PER_DAY}, 2)) AS sxx,
         sum(pow(value, 2)) AS syy
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_day,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       round(pow(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
"""


@register(
    "value_trend_per_type",
    _TREND_ORACLE,
    doc="per-event_type OLS trend (slope/day, intercept, r²) from moment "
    "sums — one partial-agg scan, no window/UDF/iteration",
)
def q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # epoch via timestampdiff from the NTZ epoch: timezone-independent
    # (see q_time_rollup — unix_micros(cast) shifts on non-UTC sessions)
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    x = (epoch_us - TREND_ANCHOR_US) / _US_PER_DAY
    y = F.col("value")
    m = _events(spark, sf_dir).groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(F.pow(x, 2)).alias("sxx"),
        F.sum(F.pow(y, 2)).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"])
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# -- partition integrity checksums ------------------------------------------
#
# The migration/replication audit primitive: an ORDER-INDEPENDENT,
# MERGEABLE fingerprint per partition key.  bit_xor of a row-content
# hash commutes and associates, so partial checksums combine across
# shards/batches with no coordination, and two tables (e.g. source
# parquet vs migrated silver, or two cluster copies) compare with a
# K-row diff instead of a row-by-row join.  Row content is serialized
# through INTEGERS ONLY (ids, epoch µs, value scaled to cents) —
# float-to-string formatting differs between engines/locales and
# would poison the hash.

_CHECKSUM_PAYLOAD_SQL = (
    "CAST(event_id AS VARCHAR) || ':' || "
    "CAST(epoch_us(ts) AS VARCHAR) || ':' || "
    "CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)"
)

_CHECKSUM_ORACLE = f"""
SELECT event_type,
       count(*) AS n_rows,
       bit_xor({hash60_sql(_CHECKSUM_PAYLOAD_SQL, "rowck")}) AS checksum
FROM events
GROUP BY 1
"""


@register(
    "audit_checksums",
    _CHECKSUM_ORACLE,
    doc="order-independent per-partition integrity checksum (bit_xor of "
    "row-content hash60 over integer-serialized fields) — mergeable "
    "across shards, single scan, partial-agg",
)
def q_audit_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import hash60

    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    payload = F.concat_ws(
        ":",
        F.col("event_id").cast("string"),
        epoch_us.cast("string"),
        F.round(F.col("value") * 100).cast("long").cast("string"),
    )
    return (
        _events(spark, sf_dir)
        .select("event_type", hash60(payload, "rowck").alias("ck"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(ck)").alias("checksum"),
        )
    )


# -- daily-volume z-score anomaly flags -------------------------------------
#
# Volume-drift detection: flag (event_type, day) buckets whose event
# count deviates from that type's daily mean by >= Z_FLAG sample
# standard deviations.  Counts are integers, so every moment sum is
# EXACT in doubles (< 2^53) — the z-score is bit-deterministic across
# engines before the final round.  Two bounded aggregations (days x
# types), stats joined back via broadcast; no window over the corpus.

Z_FLAG = 2.0

_ZSCORE_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         avg(n) AS mu,
         stddev_samp(n) AS sigma
  FROM daily GROUP BY 1
)
SELECT d.event_type,
       CAST(strftime(d.d, '%Y-%m-%d') AS VARCHAR) AS day,
       d.n,
       round((d.n - s.mu) / s.sigma, 6) AS zscore,
       CASE WHEN abs((d.n - s.mu) / s.sigma) >= {Z_FLAG}
            THEN 1 ELSE 0 END AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
"""


@register(
    "daily_volume_zscores",
    _ZSCORE_ORACLE,
    doc=f"per-(type, day) volume z-scores with |z| >= {Z_FLAG} anomaly "
    "flags — two bounded aggs + broadcast stats join, no corpus window",
)
def q_daily_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count("*").alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(z, 6).alias("zscore"),
            F.when(F.abs(z) >= Z_FLAG, 1).otherwise(0).alias("is_anomaly"),
        )
    )


# -- median-absolute-deviation outliers --------------------------------------

# Robust complement to daily_volume_zscores: median/MAD are insensitive
# to the very outliers being hunted (mean/stddev are not).  Two exact
# interpolated-percentile passes per type — each a per-type aggregate
# over the scan, stats broadcast back; no corpus-wide sort.

MAD_K = 3.0  # |x - median| > K * MAD flags an outlier

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median_v
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.median_v,
         quantile_cont(abs(e.value - med.median_v), 0.5) AS mad_v
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med.median_v
)
SELECT e.event_type,
       round(m.median_v, 6) AS median_v,
       round(m.mad_v, 6) AS mad_v,
       count(*) AS n,
       count(*) FILTER (WHERE abs(e.value - m.median_v) > {MAD_K} * m.mad_v)
         AS n_outliers
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type, m.median_v, m.mad_v
"""


@register(
    "mad_outliers_per_type",
    _MAD_ORACLE,
    doc=f"robust outlier detection: |x - median| > {MAD_K} * MAD per "
    "event type (median/MAD are outlier-insensitive, unlike the "
    "mean/stddev z-score twin). Two exact percentile aggregates per "
    "type, |types|-row stats broadcast back onto the scan",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_v")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "median_v")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("median_v")), F.lit(0.5)).alias(
                "mad_v"
            )
        )
    )
    out = F.count(
        F.when(F.abs(F.col("value") - F.col("median_v")) > MAD_K * F.col("mad_v"), 1)
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_v", "mad_v")
        .agg(F.count("*").alias("n"), out.alias("n_outliers"))
        .select(
            "event_type",
            F.round("median_v", 6).alias("median_v"),
            F.round("mad_v", 6).alias("mad_v"),
            "n",
            "n_outliers",
        )
    )


# -- Z-order layout statistics -----------------------------------------------

# The data-clustering primitive behind multi-dimensional file skipping
# (Delta/Iceberg OPTIMIZE ZORDER): interleave (user bucket, day) into a
# Morton code and show that every contiguous Z-range bounds BOTH
# dimensions — a z-sorted file layout lets scans filtered on EITHER
# key skip most files, where a lexicographic sort only serves its
# leading key.  Pure shift/mask integer arithmetic on both engines.

from huracan_spark.operators.zorder import zorder_key, zorder_key_sql  # noqa: E402

_Z_DIM = 256  # values per dimension (8 bits)
_Z_SHIFT = 10  # bucket = z >> 10: 64 buckets of 1024 z-values = 32x32 tiles

_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(user_id % {_Z_DIM} AS BIGINT) AS u,
         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) % {_Z_DIM} AS d
  FROM events
),
z AS (SELECT u, d, {zorder_key_sql('u', 'd')} AS zval FROM keyed)
SELECT zval >> {_Z_SHIFT} AS z_bucket,
       count(*) AS n,
       max(u) - min(u) AS u_span,
       max(d) - min(d) AS d_span
FROM z GROUP BY 1
"""


@register(
    "zorder_layout_stats",
    _ZORDER_ORACLE,
    doc="Z-order (Morton) clustering audit: per contiguous z-bucket, the "
    "span of BOTH interleaved dimensions — each 2^10 z-range covers a "
    "32x32 tile, so min/max file stats prune on either key (the "
    "OPTIMIZE ZORDER layout primitive); one scan, codegen'd shift/mask "
    "arithmetic, bucket cardinality bounded by the key space",
)
def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    u = (F.col("user_id") % _Z_DIM).cast("long")
    d = (
        F.floor(
            F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(86400000)
        ).cast("long")
        % _Z_DIM
    )
    z = ev.select(u.alias("u"), d.alias("d")).select(
        "u", "d", zorder_key(F.col("u"), F.col("d")).alias("zval")
    )
    return z.groupBy(F.shiftright("zval", _Z_SHIFT).alias("z_bucket")).agg(
        F.count("*").alias("n"),
        (F.max("u") - F.min("u")).alias("u_span"),
        (F.max("d") - F.min("d")).alias("d_span"),
    )


# -- correlation / covariance aggregates -------------------------------------

_CORR_ORACLE = """
SELECT event_type, count(*) AS n,
       round(corr(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4) AS corr_value_hour,
       round(covar_samp(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4)
         AS covar_value_hour
FROM events GROUP BY event_type
"""


@register(
    "value_hour_correlation",
    _CORR_ORACLE,
    doc="Pearson correlation + sample covariance between event value and "
    "hour-of-day per type — the moment-based correlation aggregates "
    "(single scan, map-side partial moments, no window)",
)
def q_value_hour_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hour = F.hour(F.col("ts")).cast("double")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.corr("value", hour), 4).alias("corr_value_hour"),
        F.round(F.covar_samp("value", hour), 4).alias("covar_value_hour"),
    )


# -- key-skew diagnostics -----------------------------------------------------

# The decision input for salting/AQE-skew-join (operators/salting.py):
# per candidate shuffle key, the frequency histogram is collapsed to a
# count-of-counts table (bounded by the number of DISTINCT frequency
# values, not keys), from which top-share and the Gini coefficient are
# exact.  The window for the Gini partial sums runs over that bounded
# count-of-counts table only.

_SKEW_ORACLE = """
WITH freq AS (
  SELECT user_id, count(*) AS f FROM events GROUP BY user_id
),
coc AS (SELECT f, count(*) AS m FROM freq GROUP BY f),
tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS n_keys, CAST(sum(f * m) AS BIGINT) AS n_rows
  FROM coc
),
cum AS (
  SELECT f, m,
         sum(m) OVER (ORDER BY f) AS cum_m,
         sum(f * m) OVER (ORDER BY f) AS cum_fm
  FROM coc
),
gini AS (
  -- G = 1 - sum_i (m_i/n) * (2*cum_fm_before + f_i*m_i) / total_mass
  SELECT 1.0 - sum((CAST(m AS DOUBLE) / tot.n_keys)
                   * (2.0 * (cum_fm - f * m) + CAST(f AS DOUBLE) * m)
                   / tot.n_rows) AS g
  FROM cum CROSS JOIN tot
)
SELECT tot.n_keys, tot.n_rows,
       (SELECT max(f) FROM coc) AS max_key_rows,
       round(CAST((SELECT max(f) FROM coc) AS DOUBLE) / tot.n_rows, 6)
         AS top1_share,
       round(gini.g, 6) AS gini
FROM tot CROSS JOIN gini
"""


@register(
    "key_skew_report",
    _SKEW_ORACLE,
    doc="shuffle-key skew diagnostics for the user_id key: exact Gini "
    "coefficient + top-1 share from the count-of-counts histogram — "
    "the table the Gini window runs over is bounded by distinct "
    "frequency VALUES, never by key cardinality (the salting/AQE "
    "decision input, operators/salting.py)",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    freq = ev.groupBy("user_id").agg(F.count("*").alias("f"))
    # coc is bounded by distinct frequency VALUES (tiny): persist it
    # eagerly so tot (-> two broadcasts) and the prefix-sum input read
    # the cache instead of re-running the corpus key-count pass
    coc = freq.groupBy("f").agg(F.count("*").alias("m")).persist()
    coc.count()
    tot = coc.agg(
        F.sum("m").cast("long").alias("n_keys"),
        F.sum(F.col("f") * F.col("m")).cast("long").alias("n_rows"),
        F.max("f").alias("max_key_rows"),
    )
    # count-of-counts rows are O(distinct frequencies) — tiny under
    # Zipf but worst-case O(#keys), so the running sum goes through
    # the distributed prefix sum, not a single-partition window
    from huracan_spark.operators.prefix_sum import global_cumsum

    cumd = global_cumsum(
        coc.withColumn("_fm", (F.col("f") * F.col("m")).cast("long")),
        "_fm",
        "f",
        out_col="cum_fm",
    ).drop("_fm")
    g_term = (
        (F.col("m").cast("double") / F.col("n_keys"))
        * (2.0 * (F.col("cum_fm") - F.col("f") * F.col("m"))
           + F.col("f").cast("double") * F.col("m"))
        / F.col("n_rows")
    )
    gini = (
        cumd.crossJoin(F.broadcast(tot))
        .agg((F.lit(1.0) - F.sum(g_term)).alias("g"))
    )
    return (
        tot.crossJoin(F.broadcast(gini))
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            F.round(F.col("max_key_rows").cast("double") / F.col("n_rows"), 6).alias(
                "top1_share"
            ),
            F.round("g", 6).alias("gini"),
        )
    )


# -- Benford first-digit audit ------------------------------------------------

# Fraud/synthetic-data screen: the first significant digit of natural
# positive quantities follows log10(1 + 1/d); the query emits the
# observed vs expected share per digit plus each digit's chi-square
# contribution.  Single scan, 9-row output.

_BENFORD_ORACLE = """
WITH pos AS (SELECT value FROM events WHERE value > 0),
digits AS (
  SELECT CAST(floor(value / power(10, floor(log10(value)))) AS BIGINT) AS d
  FROM pos
),
counts AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
SELECT c.d AS digit, c.n,
       round(CAST(c.n AS DOUBLE) / tot.total, 6) AS observed_share,
       round(log10(1.0 + 1.0 / c.d), 6) AS benford_share,
       round(power(CAST(c.n AS DOUBLE) / tot.total - log10(1.0 + 1.0 / c.d), 2)
             / log10(1.0 + 1.0 / c.d) * tot.total, 4) AS chi2_term
FROM counts c CROSS JOIN tot
"""


@register(
    "benford_first_digit",
    _BENFORD_ORACLE,
    doc="Benford's-law first-digit audit over positive event values: "
    "observed vs log10(1+1/d) expected share + per-digit chi-square "
    "contribution (the fraud/synthetic-data screen); one scan, 9-row "
    "output, digit extraction is pure column arithmetic",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("value") > 0)
    d = F.floor(
        F.col("value") / F.pow(F.lit(10.0), F.floor(F.log10("value")))
    ).cast("long")
    counts = ev.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    expect = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        "n",
        F.round(share, 6).alias("observed_share"),
        F.round(expect, 6).alias("benford_share"),
        F.round(F.pow(share - expect, F.lit(2)) / expect * F.col("total"), 4).alias(
            "chi2_term"
        ),
    )


# -- conversion rate with Wilson interval ------------------------------------

_WILSON_Z = 1.959963984540054  # 95%

_WILSON_ORACLE = f"""
WITH peru AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT count(*) AS n, CAST(sum(converted) AS BIGINT) AS k FROM peru
)
SELECT n, k,
       round(CAST(k AS DOUBLE) / n, 6) AS rate,
       round((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              - {_WILSON_Z} * sqrt((k / CAST(n AS DOUBLE))
                 * (1 - k / CAST(n AS DOUBLE)) / n
                 + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_lo,
       round((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              + {_WILSON_Z} * sqrt((k / CAST(n AS DOUBLE))
                 * (1 - k / CAST(n AS DOUBLE)) / n
                 + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_hi
FROM agg
"""


@register(
    "conversion_rate_ci",
    _WILSON_ORACLE,
    doc="user-level conversion rate with the Wilson 95% score interval "
    "(closed-form, no bootstrap/resampling pass): one per-user reduce + "
    "one scalar aggregate",
)
def q_conversion_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    peru = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    )
    agg = peru.agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("k")
    )
    z = _WILSON_Z
    p = F.col("k") / F.col("n").cast("double")
    half = z * F.sqrt(p * (1 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n")))
    center = p + z * z / (2 * F.col("n"))
    denom = 1 + z * z / F.col("n")
    return agg.select(
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


# -- KMV sketch algebra: join-cardinality estimate ----------------------------

# Pre-join sizing from per-set sketches alone — the cost-estimation
# primitive: two KMV sketches (k smallest user-hashes per event type)
# estimate their Jaccard from the shared k-min of the UNION, and
# |A ∩ B| ~ J * |A ∪ B|.  Exact truth rides alongside so the driver
# hash-checks both the estimator and its inputs.  Everything is
# deterministic given the shared hash60 family; sketch size k bounds
# every intermediate.

KMV_JOIN_K = 64

_KMVJOIN_ORACLE = f"""
WITH hv AS (
  SELECT DISTINCT event_type, user_id,
         {hash60_sql("user_id::VARCHAR", "kmvjoin")} AS h
  FROM events WHERE event_type IN ('click', 'purchase')
),
ka AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hv
    WHERE event_type = 'click'
  ) WHERE rn <= {KMV_JOIN_K}
),
kb AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hv
    WHERE event_type = 'purchase'
  ) WHERE rn <= {KMV_JOIN_K}
),
ku AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ) WHERE rn <= {KMV_JOIN_K}
),
j AS (
  SELECT CAST(count(*) AS BIGINT) AS shared FROM ku
  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
),
union_est AS (
  SELECT round(({KMV_JOIN_K} - 1) * pow(2, 60) / max(h), 2) AS u_est
  FROM ku
),
truth AS (
  SELECT CAST(count(DISTINCT CASE WHEN in_both THEN user_id END) AS BIGINT)
           AS exact_intersection
  FROM (
    SELECT user_id, count(DISTINCT event_type) = 2 AS in_both
    FROM hv GROUP BY user_id
  )
)
SELECT j.shared, round(CAST(j.shared AS DOUBLE) / {KMV_JOIN_K}, 6) AS jaccard_est,
       union_est.u_est,
       round(CAST(j.shared AS DOUBLE) / {KMV_JOIN_K} * union_est.u_est, 2)
         AS intersection_est,
       truth.exact_intersection
FROM j CROSS JOIN union_est CROSS JOIN truth
"""


@register(
    "kmv_join_estimate",
    _KMVJOIN_ORACLE,
    doc=f"sketch-algebra join sizing: two {KMV_JOIN_K}-min KMV sketches "
    "estimate the click/purchase user-set intersection (J from the "
    "shared union k-min, |A∩B| ~ J*|A∪B|) next to the exact truth — "
    "the pre-join cost-estimation primitive; every intermediate is "
    "k-bounded, the raw sets reduce once each",
)
def q_kmv_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import hash60

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    hv = ev.select(
        "event_type",
        "user_id",
        hash60(F.col("user_id").cast("string"), "kmvjoin").alias("h"),
    ).distinct().persist()
    # eager: hv feeds ka/kb/both — one distinct pass, not three
    hv.count()

    def kmin(df: DataFrame) -> DataFrame:
        # distributed k-min: TakeOrderedAndProject, never a global window
        return df.select("h").orderBy("h").limit(KMV_JOIN_K)

    ka = kmin(hv.filter(F.col("event_type") == "click")).persist()
    kb = kmin(hv.filter(F.col("event_type") == "purchase")).persist()
    ku = kmin(ka.unionByName(kb).distinct()).persist()
    shared = (
        ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    u_est = ku.agg(
        F.round((KMV_JOIN_K - 1) * F.lit(float(1 << 60)) / F.max("h"), 2).alias(
            "u_est"
        )
    )
    both = (
        hv.groupBy("user_id")
        .agg((F.countDistinct("event_type") == 2).alias("both"))
        .agg(
            F.count(F.when(F.col("both"), 1))
            .cast("long")
            .alias("exact_intersection")
        )
    )
    return (
        shared.crossJoin(F.broadcast(u_est))
        .crossJoin(F.broadcast(both))
        .select(
            "shared",
            F.round(F.col("shared").cast("double") / KMV_JOIN_K, 6).alias(
                "jaccard_est"
            ),
            "u_est",
            F.round(
                F.col("shared").cast("double") / KMV_JOIN_K * F.col("u_est"), 2
            ).alias("intersection_est"),
            "exact_intersection",
        )
    )


# -- data-quality rule report -------------------------------------------------

_DQ_ORACLE = """
WITH base AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE user_id IS NULL) AS v_null,
         count(*) FILTER (WHERE value IS NULL OR value < 0 OR value > 50)
           AS v_range,
         count(*) FILTER (WHERE event_type IS NULL
                          OR event_type NOT IN ('click','view','purchase','error'))
           AS v_set,
         count(*) FILTER (WHERE props IS NULL
                          OR NOT regexp_matches(props, '^\\{')) AS v_json
  FROM events
),
uniq AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS v
  FROM (SELECT event_id, count(*) AS c FROM events GROUP BY event_id)
)
SELECT rule, n_rows, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'not_null(user_id)' AS rule, n AS n_rows, v_null AS n_violations
  FROM base
  UNION ALL SELECT 'in_range(value,0,50)', n, v_range FROM base
  UNION ALL SELECT 'in_set(event_type)', n, v_set FROM base
  UNION ALL SELECT 'matches(props)', n, v_json FROM base
  UNION ALL SELECT 'unique(event_id)', n, v FROM uniq
)
"""


@register(
    "dq_violation_report",
    _DQ_ORACLE,
    doc="declarative data-quality report (deequ/Great-Expectations "
    "shape): four row-level rules compile into ONE conditional-count "
    "scan, uniqueness adds one hash-agg — never |rules| re-scans "
    "(operators/dq.py)",
)
def q_dq_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.dq import (
        check,
        in_range,
        in_set,
        matches,
        not_null,
        unique,
    )

    ev = _events(spark, sf_dir)
    rules = [
        not_null("user_id"),
        in_range("value", 0, 50),
        in_set("event_type", ["click", "view", "purchase", "error"]),
        matches("props", r"^\{"),
        unique("event_id"),
    ]
    out = check(ev, rules)
    # align rule labels with the oracle's fixed strings
    label = (
        F.when(F.col("rule").startswith("in_range"), F.lit("in_range(value,0,50)"))
        .when(F.col("rule").startswith("in_set"), F.lit("in_set(event_type)"))
        .when(F.col("rule").startswith("matches"), F.lit("matches(props)"))
        .otherwise(F.col("rule"))
    )
    return out.select(
        label.alias("rule"), "n_rows", "n_violations", "passed"
    )


# -- VARIANT semi-structured extraction ---------------------------------------

# Spark 4's VARIANT type: parse the props JSON once into a binary
# variant and extract typed paths from it — the engine-native
# semi-structured path (vs per-path get_json_object re-parsing the
# string; SURVEY §1.4's typed-view option on the modern type).

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register(
    "props_variant_stats",
    _VARIANT_ORACLE,
    doc="VARIANT semi-structured aggregation: props parsed ONCE per row "
    "into Spark 4's binary variant, typed paths extracted with "
    "variant_get — single scan, no per-path string re-parse",
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


# -- A/B test significance ----------------------------------------------------

# Two-proportion z-test over a content-stable hash split of users (the
# same RNG-free assignment discipline as hash_split): "conversion" =
# the user's purchase share of events exceeds 0.2 (a scale-free
# definition with real variance on the fixture).  Closed form, no
# resampling; one per-user reduce + one 2-row aggregate.

_AB_ORACLE = f"""
WITH peru AS (
  SELECT user_id,
         CASE WHEN {hash60_sql("user_id::VARCHAR", 'abtest')} % 2 = 0
              THEN 'A' ELSE 'B' END AS grp,
         CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
                   > 0.2 * count(*) THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT grp, count(*) AS n, CAST(sum(conv) AS BIGINT) AS k
  FROM peru GROUP BY grp
),
w AS (
  SELECT max(CASE WHEN grp = 'A' THEN n END) AS na,
         max(CASE WHEN grp = 'A' THEN k END) AS ka,
         max(CASE WHEN grp = 'B' THEN n END) AS nb,
         max(CASE WHEN grp = 'B' THEN k END) AS kb
  FROM g
)
SELECT na, ka, nb, kb,
       round(CAST(ka AS DOUBLE) / na, 6) AS rate_a,
       round(CAST(kb AS DOUBLE) / nb, 6) AS rate_b,
       round((CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb)
             / sqrt((CAST(ka + kb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ka + kb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 4) AS z_score,
       abs((CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb)
           / sqrt((CAST(ka + kb AS DOUBLE) / (na + nb))
                  * (1 - CAST(ka + kb AS DOUBLE) / (na + nb))
                  * (1.0 / na + 1.0 / nb))) > 1.96 AS significant_95
FROM w
"""


@register(
    "ab_test_significance",
    _AB_ORACLE,
    doc="two-proportion z-test over a content-stable 50/50 user hash "
    "split (RNG-free assignment, pooled-variance closed form, no "
    "resampling): one per-user reduce + one scalar aggregate",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.functions.textfns import hash60

    ev = _events(spark, sf_dir)
    grp = F.when(
        hash60(F.col("user_id").cast("string"), "abtest") % 2 == 0, "A"
    ).otherwise("B")
    peru = ev.groupBy("user_id").agg(
        F.first(grp).alias("grp"),
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            > 0.2 * F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    )
    g = peru.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("conv").cast("long").alias("k")
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "A", F.col("k"))).alias("ka"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "B", F.col("k"))).alias("kb"),
    )
    pa = F.col("ka") / F.col("na").cast("double")
    pb = F.col("kb") / F.col("nb").cast("double")
    pp = (F.col("ka") + F.col("kb")).cast("double") / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return w.select(
        "na",
        "ka",
        "nb",
        "kb",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# -- population stability index (distribution drift) ------------------------
#
# The model-monitoring drift metric applied to the event stream: per
# event type, compare the `value` distribution in the EARLY half of
# the time range against the LATE half over 10 fixed equi-width bins;
# PSI = Σ (p_i - q_i)·ln(p_i / q_i) with Laplace smoothing so empty
# bins can't produce ±inf.  Everything is one scan + bounded-side
# joins: the global (min day, max day, min value, max value) stats
# are a 1-row broadcast, the per-(type, bin, half) counts are a hash
# agg over ≤ |types|·10·2 groups, and the PSI fold runs over that
# bounded grid — never a corpus-side window.  The early/late split is
# INTEGER day arithmetic (dayno*2 <= min+max), so bucket membership
# is bit-identical across engines.

_PSI_NBINS = 10

_PSI_ORACLE = f"""
WITH ev AS (
  SELECT event_type, value,
         CAST(floor(epoch_ms(date_trunc('day', ts)) / 86400000) AS BIGINT)
           AS dayno
  FROM events
),
bounds AS (
  SELECT min(dayno) AS d0, max(dayno) AS d1,
         min(value) AS v0, max(value) AS v1
  FROM ev
),
binned AS (
  SELECT e.event_type,
         CASE WHEN e.dayno * 2 <= b.d0 + b.d1 THEN 'early' ELSE 'late' END
           AS half,
         CAST(least(floor((e.value - b.v0) / ((b.v1 - b.v0) / {_PSI_NBINS})),
                    {_PSI_NBINS - 1}) AS BIGINT) AS bin
  FROM ev e CROSS JOIN bounds b
),
grid AS (
  SELECT event_type, half, bin, count(*) AS n
  FROM binned GROUP BY event_type, half, bin
),
tot AS (
  SELECT event_type, half, sum(n) AS tot FROM grid GROUP BY event_type, half
),
bins AS (SELECT unnest(generate_series(0, {_PSI_NBINS - 1})) AS bin),
types AS (SELECT DISTINCT event_type FROM ev),
dense AS (
  SELECT t.event_type, b.bin,
         coalesce(ge.n, 0) AS n_early, coalesce(gl.n, 0) AS n_late
  FROM types t CROSS JOIN bins b
  LEFT JOIN grid ge ON ge.event_type = t.event_type AND ge.bin = b.bin
                    AND ge.half = 'early'
  LEFT JOIN grid gl ON gl.event_type = t.event_type AND gl.bin = b.bin
                    AND gl.half = 'late'
),
smoothed AS (
  SELECT d.event_type,
         (d.n_early + 0.5)
           / (te.tot + 0.5 * {_PSI_NBINS}) AS p,
         (d.n_late + 0.5)
           / (tl.tot + 0.5 * {_PSI_NBINS}) AS q,
         d.n_early, d.n_late
  FROM dense d
  JOIN tot te ON te.event_type = d.event_type AND te.half = 'early'
  JOIN tot tl ON tl.event_type = d.event_type AND tl.half = 'late'
)
SELECT event_type,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       CAST(sum(n_early) AS BIGINT) AS n_early,
       CAST(sum(n_late) AS BIGINT) AS n_late
FROM smoothed GROUP BY event_type
"""


@register(
    "psi_value_drift",
    _PSI_ORACLE,
    doc="population stability index per event type: early-half vs "
    "late-half value distribution over 10 fixed equi-width bins with "
    "Laplace smoothing — global bounds broadcast as a 1-row table, "
    "the PSI fold runs over the bounded (type x bin) grid, integer-day "
    "split arithmetic; the model-monitoring drift metric as one scan",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.floor(
            F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
            / F.lit(86400000)
        )
        .cast("long")
        .alias("dayno"),
    )
    bounds = ev.agg(
        F.min("dayno").alias("d0"),
        F.max("dayno").alias("d1"),
        F.min("value").alias("v0"),
        F.max("value").alias("v1"),
    )
    width = (F.col("v1") - F.col("v0")) / F.lit(_PSI_NBINS)
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("dayno") * 2 <= F.col("d0") + F.col("d1"), F.lit("early")
        )
        .otherwise(F.lit("late"))
        .alias("half"),
        F.least(
            F.floor((F.col("value") - F.col("v0")) / width),
            F.lit(_PSI_NBINS - 1),
        )
        .cast("long")
        .alias("bin"),
    )
    # grid is bounded by |types| x 2 x NBINS — persist it eagerly so
    # the four consumers below (tot -> te/tl, ge, gl, types) read the
    # tiny cached grid; types derives FROM the grid (every type has
    # >=1 binned row), dropping a third full events scan.  bounds +
    # binned remain the two inherent passes of any histogram.
    grid = (
        binned.groupBy("event_type", "half", "bin")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    grid.count()
    tot = grid.groupBy("event_type", "half").agg(F.sum("n").alias("tot"))
    bins = spark.range(_PSI_NBINS).select(F.col("id").alias("bin"))
    types = grid.select("event_type").distinct()
    ge = grid.filter(F.col("half") == "early").select(
        "event_type", "bin", F.col("n").alias("n_early")
    )
    gl = grid.filter(F.col("half") == "late").select(
        "event_type", "bin", F.col("n").alias("n_late")
    )
    dense = (
        types.crossJoin(F.broadcast(bins))
        .join(ge, ["event_type", "bin"], "left")
        .join(gl, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("n_early", F.lit(0)).alias("n_early"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
    )
    te = tot.filter(F.col("half") == "early").select(
        "event_type", F.col("tot").alias("tot_e")
    )
    tl = tot.filter(F.col("half") == "late").select(
        "event_type", F.col("tot").alias("tot_l")
    )
    sm = (
        dense.join(te, "event_type")
        .join(tl, "event_type")
        .select(
            "event_type",
            "n_early",
            "n_late",
            (
                (F.col("n_early") + 0.5)
                / (F.col("tot_e") + 0.5 * _PSI_NBINS)
            ).alias("p"),
            (
                (F.col("n_late") + 0.5)
                / (F.col("tot_l") + 0.5 * _PSI_NBINS)
            ).alias("q"),
        )
    )
    return sm.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
        F.sum("n_early").cast("long").alias("n_early"),
        F.sum("n_late").cast("long").alias("n_late"),
    )


# -- mutual information: event_type x hour-of-day ---------------------------
#
# How much the event mix depends on time of day: MI(T; H) =
# Σ p(t,h)·ln(p(t,h)/(p(t)p(h))) over the bounded |types|x24 grid,
# with the marginal entropies for context (MI=0 ⇒ mix is time-
# independent; MI≈H ⇒ hour determines type).  One count scan; the
# joint and marginal tables are grid-bounded; every probability
# divides the same exact-integer counts, so terms are bit-identical
# before the final round.

_MI_ORACLE = """
WITH joint AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS total FROM joint),
mt AS (SELECT event_type, sum(n) AS nt FROM joint GROUP BY 1),
mh AS (SELECT hr, sum(n) AS nh FROM joint GROUP BY 1),
terms AS (
  SELECT (j.n / t.total)
           * ln((j.n / t.total)
                / ((mt.nt / t.total) * (mh.nh / t.total))) AS mi_term
  FROM joint j
  CROSS JOIN tot t
  JOIN mt ON mt.event_type = j.event_type
  JOIN mh ON mh.hr = j.hr
),
ent_t AS (
  SELECT -sum((mt.nt / t.total) * ln(mt.nt / t.total)) AS h_type
  FROM mt CROSS JOIN tot t
),
ent_h AS (
  SELECT -sum((mh.nh / t.total) * ln(mh.nh / t.total)) AS h_hour
  FROM mh CROSS JOIN tot t
)
SELECT round(sum(mi_term), 6) AS mi,
       round(any_value(h_type), 6) AS h_type,
       round(any_value(h_hour), 6) AS h_hour
FROM terms CROSS JOIN ent_t CROSS JOIN ent_h
"""


@register(
    "type_hour_mutual_info",
    _MI_ORACLE,
    doc="mutual information between event type and hour-of-day plus "
    "both marginal entropies — the time-dependence audit of the event "
    "mix; one count scan, all folds over the bounded |types|x24 grid",
)
def q_type_hour_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # joint is the |types|x24 grid — persist it eagerly so the five
    # consumers below (tot/mt/mh through broadcasts, terms, both
    # entropies) fold over the tiny cached grid instead of each
    # re-running the corpus count scan (the before-plan carried 36
    # Exchanges for a one-scan query)
    joint = (
        ev.groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(F.count("*").alias("n"))
        .persist()
    )
    joint.count()
    tot = joint.agg(F.sum("n").alias("total"))
    mt = joint.groupBy("event_type").agg(F.sum("n").alias("nt"))
    mh = joint.groupBy("hr").agg(F.sum("n").alias("nh"))
    terms = (
        joint.crossJoin(F.broadcast(tot))
        .join(F.broadcast(mt), "event_type")
        .join(F.broadcast(mh), "hr")
        .select(
            (
                (F.col("n") / F.col("total"))
                * F.log(
                    (F.col("n") / F.col("total"))
                    / (
                        (F.col("nt") / F.col("total"))
                        * (F.col("nh") / F.col("total"))
                    )
                )
            ).alias("mi_term")
        )
    )
    ent_t = mt.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("nt") / F.col("total")) * F.log(F.col("nt") / F.col("total"))))
        .alias("h_type")
    )
    ent_h = mh.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("nh") / F.col("total")) * F.log(F.col("nh") / F.col("total"))))
        .alias("h_hour")
    )
    return (
        terms.agg(F.sum("mi_term").alias("mi_raw"))
        .crossJoin(F.broadcast(ent_t))
        .crossJoin(F.broadcast(ent_h))
        .select(
            F.round("mi_raw", 6).alias("mi"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_hour", 6).alias("h_hour"),
        )
    )


# -- referential-integrity audit across the star schema ---------------------
#
# The cross-table conformance check the single-table rule engine
# (operators/dq.py) deliberately leaves out: orphaned foreign keys
# per relationship, as LEFT ANTI joins that never materialize the
# match (at 100 TB the child side streams once per relationship and
# the parent key set rides the join hash table; AQE picks
# broadcast-anti where the parent fits).  DISTINCT child keys first —
# the anti-join then runs on the deduplicated key set, not raw rows.

_FK_ORACLE = """
WITH checks AS (
  SELECT 'lineitem.l_orderkey->orders' AS relationship,
         CAST((SELECT count(DISTINCT l.l_orderkey) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_orphan_keys,
         CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem)
              AS BIGINT) AS n_child_keys
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         CAST((SELECT count(DISTINCT o.o_custkey) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT),
         CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
         CAST((SELECT count(DISTINCT c.c_nationkey) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey))
              AS BIGINT),
         CAST((SELECT count(DISTINCT c_nationkey) FROM customer) AS BIGINT)
)
SELECT relationship, n_orphan_keys, n_child_keys,
       round(CAST(n_orphan_keys AS DOUBLE) / n_child_keys, 6)
         AS orphan_frac
FROM checks
"""


@register(
    "fk_orphan_report",
    _FK_ORACLE,
    doc="referential-integrity audit: orphaned-FK key counts for the "
    "three star-schema relationships via LEFT ANTI joins over DISTINCT "
    "child keys — child scans once per relationship, parents ride the "
    "join hash table (broadcast-anti when they fit)",
)
def q_fk_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def _check(rel: str, child, ckey: str, parent, pkey: str) -> DataFrame:
        # persist: the distinct child-key set feeds BOTH the anti-join
        # and the denominator count — one distinct pass, not two
        keys = child.select(F.col(ckey).alias("k")).distinct().persist()
        orphans = keys.join(
            parent.select(F.col(pkey).alias("k")), "k", "left_anti"
        )
        return (
            orphans.agg(F.count("*").alias("n_orphan_keys"))
            .crossJoin(keys.agg(F.count("*").alias("n_child_keys")))
            .select(
                F.lit(rel).alias("relationship"),
                F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
                F.col("n_child_keys").cast("long").alias("n_child_keys"),
                F.round(
                    F.col("n_orphan_keys").cast("double")
                    / F.col("n_child_keys"),
                    6,
                ).alias("orphan_frac"),
            )
        )

    a = _check("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
    b = _check("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey")
    c = _check("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey")
    return a.unionByName(b).unionByName(c)


# -- VARIANT dynamic fields (Spark 4 semi-structured type) -------------------
#
# Extends props_variant_stats (above) to the full dynamic-field
# surface the reference serves through Q7/Q8 (server GraphQL field
# lookups are NESTED paths on arbitrary objects): nested-path
# extraction ($.meta.k), string-typed extraction, a PREDICATE on an
# extracted field (the dynamic-field filter shape), and missing-path
# semantics (try_variant_get -> NULL, counted as 0).  Both sides build
# the SAME enriched JSON document from columns (ints/strings only — no
# float formatting divergence), so the DuckDB json_extract oracle pins
# the VARIANT machinery end-to-end.

_VARIANT_ORACLE = """
WITH j AS (
  SELECT '{"meta":' || props || ',"type":"' || event_type || '","user":'
         || CAST(user_id AS VARCHAR) || '}' AS doc
  FROM events
)
SELECT json_extract_string(doc, '$.type') AS vtype,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(doc, '$.meta.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(count(json_extract(doc, '$.absent')) AS BIGINT) AS n_absent
FROM j
WHERE CAST(json_extract(doc, '$.meta.k') AS BIGINT) % 7 = 0
GROUP BY 1
"""


@register(
    "variant_dynamic_fields",
    _VARIANT_ORACLE,
    doc="Spark 4 VARIANT semi-structured path for dynamic fields "
    "(Q7/Q8): parse_json once, variant_get typed extraction + "
    "predicate, try_variant_get missing-path NULL semantics; "
    "single-scan hash agg — parse/extract are JVM expressions, "
    "shredding-ready at scale",
)
def q_variant_dynamic_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    doc = F.concat(
        F.lit('{"meta":'), F.col("props"),
        F.lit(',"type":"'), F.col("event_type"),
        F.lit('","user":'), F.col("user_id").cast("string"),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    k = F.variant_get(v, "$.meta.k", "bigint")
    return (
        ev.select(
            F.variant_get(v, "$.type", "string").alias("vtype"),
            k.alias("k"),
            F.try_variant_get(v, "$.absent", "bigint").alias("absent"),
        )
        .filter(F.col("k") % 7 == 0)
        .groupBy("vtype")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.count("absent").alias("n_absent"),
        )
    )
