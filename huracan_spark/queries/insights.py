"""Cross-sectional insight operators (beyond-reference extensions,
round-5 continuation): regression, market-basket rules, item-item
collaborative filtering, corpus keyness, k-core decomposition, and
seasonal decomposition.

- ``value_ols_per_type`` — per-type OLS of event value on hour-of-day
  from explicit moment sums (n, mean, cov, var written identically on
  both engines so the slope/intercept/r2 arithmetic matches to the
  rounding digit).  One scan, |types|-bounded output.
- ``brand_assoc_rules`` — market-basket association rules over
  order->brand baskets: support / confidence / lift from exact integer
  counts (single-division doubles are bit-identical cross-engine).
  The per-order pair fanout is bounded by the brand dimension, never
  by data volume.
- ``brand_affinity_cosine`` — item-item collaborative filtering:
  cosine over customer-brand incidence sets, top-3 neighbors per
  brand.  The classic "users who bought X also bought Y" kernel; the
  self-join fans out per customer by their distinct-brand count,
  bounded by |brands|.
- ``source_keyness_g2`` — Dunning (1993) log-likelihood keyness: which
  tokens are over-represented in each source vs the rest of the
  corpus.  2x2 contingency per (source, token) from exact counts; the
  four G2 terms are written in the same order on both engines.
- ``kcore_trade_graph`` — k-core decomposition (k=2, fixed-round
  peeling) of the above-average-intensity nation trade graph (same
  edge construction as bfs_trade_hops/triangles, graph.py).  Each
  round is one partial-agg degree count + two semi-joins; the oracle
  unrolls the rounds as CTEs.
- ``seasonal_decomp_daily`` — additive decomposition of the daily
  value series: 7-day centered-MA trend + day-of-week seasonal +
  residual.  All windows run over the calendar-bounded daily series
  (the corpus-sized scan reduces first), with daily totals rounded
  before the window math so cross-engine fold order cannot leak.

No reference analog (the reference ships no analytics of this class);
these are the LLM-pipeline/ops extensions the build brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

KCORE_K = 2
KCORE_ROUNDS = 4
MIN_SUPPORT = 0.01


# -- per-type OLS regression -------------------------------------------------

_OLS_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         avg(CAST(extract(hour FROM ts) AS DOUBLE)) AS mx,
         avg(value) AS my,
         avg(CAST(extract(hour FROM ts) AS DOUBLE) * value) AS mxy,
         avg(CAST(extract(hour FROM ts) AS DOUBLE)
             * CAST(extract(hour FROM ts) AS DOUBLE)) AS mxx,
         avg(value * value) AS myy
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((mxy - mx * my) / (mxx - mx * mx), 6) AS slope,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 6) AS intercept,
       round((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)), 6) AS r2
FROM m
"""


@register(
    "value_ols_per_type",
    _OLS_ORACLE,
    doc="per-type OLS of value on hour-of-day from explicit moment "
    "averages (identical formula text on both engines; rounding "
    "absorbs fold-order ulps) — one scan, |types|-bounded output",
)
def q_value_ols_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.hour("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
        )
    )
    m = e.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    slope = cov / varx
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


# -- market-basket association rules ----------------------------------------

_ASSOC_ORACLE = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
nb AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.n_ab,
       round(CAST(p.n_ab AS DOUBLE) / t.n_orders, 6) AS support,
       round(CAST(p.n_ab AS DOUBLE) / na.n, 6) AS conf_a_to_b,
       round(CAST(p.n_ab AS DOUBLE) * t.n_orders / (na.n * nb.n), 6) AS lift
FROM pairs p
JOIN nb na ON p.brand_a = na.brand
JOIN nb nb ON p.brand_b = nb.brand
CROSS JOIN tot t
WHERE CAST(p.n_ab AS DOUBLE) / t.n_orders >= {MIN_SUPPORT}
"""


@register(
    "brand_assoc_rules",
    _ASSOC_ORACLE,
    doc=f"market-basket association rules over order->brand baskets "
    f"(support >= {MIN_SUPPORT}): support/confidence/lift from exact "
    "integer counts — the per-order pair fanout is bounded by the "
    "brand dimension; brand marginals broadcast back onto the pairs",
)
def q_brand_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    # eager: ob feeds FOUR consumers (tot, nb, both self-join sides) and
    # two of them arrive as broadcasts — lazy persist would let the
    # broadcast threads race the cache fill and re-run the corpus
    # join+distinct up to 3x concurrently (the r7 broadcast-race class).
    # One count() materializes it once; everything downstream reads cache.
    ob.count()
    tot = ob.agg(F.countDistinct("okey").cast("long").alias("n_orders"))
    nb = ob.groupBy("brand").agg(F.count("*").cast("long").alias("n"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    na = F.broadcast(nb.select(F.col("brand").alias("brand_a"), F.col("n").alias("na")))
    nbb = F.broadcast(nb.select(F.col("brand").alias("brand_b"), F.col("n").alias("nb")))
    out = (
        pairs.join(na, "brand_a")
        .join(nbb, "brand_b")
        .crossJoin(F.broadcast(tot))
    )
    support = F.col("n_ab").cast("double") / F.col("n_orders")
    return out.filter(support >= MIN_SUPPORT).select(
        "brand_a",
        "brand_b",
        "n_ab",
        F.round(support, 6).alias("support"),
        F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias("conf_a_to_b"),
        F.round(
            F.col("n_ab").cast("double") * F.col("n_orders")
            / (F.col("na") * F.col("nb")),
            6,
        ).alias("lift"),
    )


# -- item-item collaborative filtering ----------------------------------------

_AFFINITY_ORACLE = """
WITH cb AS (
  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
sz AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM cb GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM cb a JOIN cb b ON a.cust = b.cust AND a.brand <> b.brand
  GROUP BY 1, 2
),
scored AS (
  SELECT p.brand_a, p.brand_b, p.n_ab,
         round(CAST(p.n_ab AS DOUBLE) / sqrt(CAST(sa.n * sb.n AS DOUBLE)), 6)
           AS cosine
  FROM pairs p
  JOIN sz sa ON p.brand_a = sa.brand
  JOIN sz sb ON p.brand_b = sb.brand
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY brand_a ORDER BY cosine DESC, brand_b
  ) AS rk
  FROM scored
)
SELECT brand_a, brand_b, n_ab, cosine, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


@register(
    "brand_affinity_cosine",
    _AFFINITY_ORACLE,
    doc="item-item CF: cosine over customer-brand incidence sets, "
    "top-3 neighbors per brand (ties broken on brand name) — the "
    "'bought X also bought Y' kernel; self-join fanout bounded by "
    "per-customer distinct brands <= |brands|",
)
def q_brand_affinity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cb = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    # eager: cb feeds THREE consumers (sz -> two broadcasts, both
    # self-join sides); materialize once so the broadcast threads and
    # the self-join read cache instead of re-running the 3-way
    # corpus join+distinct per branch (r7 broadcast-race class)
    cb.count()
    sz = cb.groupBy("brand").agg(F.count("*").cast("long").alias("n"))
    a, b = cb.alias("a"), cb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.brand") != F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    sa = F.broadcast(sz.select(F.col("brand").alias("brand_a"), F.col("n").alias("na")))
    sb = F.broadcast(sz.select(F.col("brand").alias("brand_b"), F.col("n").alias("nb")))
    scored = (
        pairs.join(sa, "brand_a")
        .join(sb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("brand_a").orderBy(F.desc("cosine"), F.asc("brand_b"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("brand_a", "brand_b", "n_ab", "cosine", "rk")
    )


# -- corpus keyness (Dunning G2) ----------------------------------------------

# term(x, E) with the 0*ln(0)=0 guard; the four terms fold in written
# order on both engines, over exact BIGINT-derived doubles
_G2_TERM = (
    "CASE WHEN {x} > 0 THEN CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE) / ({e})) "
    "ELSE 0.0 END"
)

_KEYNESS_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({tokens_sql('text')}) AS tok FROM documents
),
tk AS (SELECT * FROM toks WHERE tok <> ''),
a_cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS a FROM tk GROUP BY 1, 2),
t_cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS t FROM tk GROUP BY tok),
s_cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS s FROM tk GROUP BY source),
n_cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
cells AS (
  SELECT a_cnt.source, a_cnt.tok, a, t, s, n,
         t - a AS b, s - a AS c, n - t - s + a AS d
  FROM a_cnt
  JOIN t_cnt ON a_cnt.tok = t_cnt.tok
  JOIN s_cnt ON a_cnt.source = s_cnt.source
  CROSS JOIN n_cnt
),
g AS (
  SELECT source, tok, a, t,
         round(2.0 * (
           {_G2_TERM.format(x='a', e='CAST(t AS DOUBLE) * s / n')}
           + {_G2_TERM.format(x='b', e='CAST(t AS DOUBLE) * (n - s) / n')}
           + {_G2_TERM.format(x='c', e='CAST(n - t AS DOUBLE) * s / n')}
           + {_G2_TERM.format(x='d', e='CAST(n - t AS DOUBLE) * (n - s) / n')}
         ), 6) AS g2,
         (CAST(a AS DOUBLE) / s > CAST(t - a AS DOUBLE) / (n - s)) AS enriched
  FROM cells
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY g2 DESC, tok
  ) AS rk
  FROM g WHERE enriched
)
SELECT source, tok, a AS n_in_source, t AS n_total, g2, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 5
"""


@register(
    "source_keyness_g2",
    _KEYNESS_ORACLE,
    doc="Dunning log-likelihood keyness: top-5 tokens most "
    "over-represented in each source vs the rest of the corpus — 2x2 "
    "contingency from exact counts, G2 terms folded in written order "
    "both engines, marginals equi-join back onto the cell table",
)
def q_source_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    a_cnt = tk.groupBy("source", "tok").agg(F.count("*").cast("long").alias("a"))
    t_cnt = tk.groupBy("tok").agg(F.count("*").cast("long").alias("t"))
    s_cnt = tk.groupBy("source").agg(F.count("*").cast("long").alias("s"))
    n_cnt = tk.agg(F.count("*").cast("long").alias("n"))
    cells = (
        a_cnt.join(t_cnt, "tok")
        .join(F.broadcast(s_cnt), "source")
        .crossJoin(F.broadcast(n_cnt))
    )
    a, t, s, n = (F.col(x) for x in ("a", "t", "s", "n"))
    b, c, d = t - a, s - a, n - t - s + a

    def term(x, e):
        return F.when(
            x > 0, x.cast("double") * F.log(x.cast("double") / e)
        ).otherwise(F.lit(0.0))

    g2 = F.round(
        2.0
        * (
            term(a, t.cast("double") * s / n)
            + term(b, t.cast("double") * (n - s) / n)
            + term(c, (n - t).cast("double") * s / n)
            + term(d, (n - t).cast("double") * (n - s) / n)
        ),
        6,
    )
    enriched = (a.cast("double") / s) > ((t - a).cast("double") / (n - s))
    g = cells.select(
        "source",
        "tok",
        a.alias("n_in_source"),
        t.alias("n_total"),
        g2.alias("g2"),
        enriched.alias("enriched"),
    ).filter("enriched")
    w = Window.partitionBy("source").orderBy(F.desc("g2"), F.asc("tok"))
    return (
        g.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("source", "tok", "n_in_source", "n_total", "g2", "rk")
    )


# -- k-core decomposition ------------------------------------------------------

_KCORE_EDGES = """
trades AS (
  SELECT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
und AS MATERIALIZED (
  SELECT least(a, b) AS x, greatest(a, b) AS y, count(*) AS n_trades
  FROM trades GROUP BY 1, 2
),
kept AS MATERIALIZED (
  SELECT x, y FROM und WHERE n_trades > (SELECT avg(n_trades) FROM und)
),
b0 AS MATERIALIZED (
  SELECT x AS src, y AS dst FROM kept
  UNION ALL
  SELECT y AS src, x AS dst FROM kept
)"""


def _kcore_round_sql(r: int) -> str:
    # AS MATERIALIZED is load-bearing: b{r} is referenced twice (by d{r}
    # and b{r+1}) and a{r} twice (both sides of the semi-join), so DuckDB's
    # default inlining re-evaluates the chain 2^rounds times — under the
    # harness's 24GB memory cap that OOMs (cannot spill mid-inline).
    # Materialized, each round evaluates once and the whole walk is instant.
    return f"""
d{r} AS MATERIALIZED (SELECT src, count(*) AS deg FROM b{r} GROUP BY src),
a{r} AS MATERIALIZED (SELECT src FROM d{r} WHERE deg >= {KCORE_K}),
b{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM b{r} e
  JOIN a{r} s ON e.src = s.src
  JOIN a{r} t ON e.dst = t.src
)"""


_KCORE_ORACLE = (
    "WITH "
    + _KCORE_EDGES
    + ","
    + ",".join(_kcore_round_sql(r) for r in range(KCORE_ROUNDS))
    + f"""
SELECT n.n_name, CAST(d.deg AS BIGINT) AS core_degree
FROM (SELECT src, count(*) AS deg FROM b{KCORE_ROUNDS} GROUP BY src) d
JOIN nation n ON d.src = n.n_nationkey
"""
)


@register(
    "kcore_trade_graph",
    _KCORE_ORACLE,
    doc=f"k-core decomposition (k={KCORE_K}, {KCORE_ROUNDS} peeling "
    "rounds) of the above-average-intensity trade graph — each round "
    "is one partial-agg degree count + two semi-joins; no driver "
    "graph state; the oracle unrolls the rounds as CTEs",
)
def q_kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    trades = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b"))
    )
    und = trades.groupBy(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    ).agg(F.count("*").alias("n_trades"))
    avg_n = und.agg(F.avg("n_trades").alias("avg_n"))
    kept = (
        und.crossJoin(F.broadcast(avg_n))
        .filter(F.col("n_trades") > F.col("avg_n"))
        .select("x", "y")
    )
    bi = kept.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        kept.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    # fixed-round peeling: the surviving edge set shrinks monotonically,
    # so localCheckpoint truncates lineage instead of replaying the
    # 4-table trade join every round
    bi = bi.localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        deg = bi.groupBy("src").agg(F.count("*").alias("deg"))
        alive = deg.filter(F.col("deg") >= KCORE_K).select("src")
        bi = (
            bi.join(F.broadcast(alive), "src", "left_semi")
            .join(
                F.broadcast(alive.withColumnRenamed("src", "dst")),
                "dst",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    core = bi.groupBy("src").agg(F.count("*").cast("long").alias("core_degree"))
    return core.join(
        F.broadcast(nation), core.src == nation.n_nationkey
    ).select("n_name", "core_degree")


# -- seasonal decomposition ------------------------------------------------------

_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
         round(sum(value), 6) AS total
  FROM events GROUP BY 1
),
t AS (
  SELECT day_ms, total,
         CASE WHEN count(*) OVER w = 7
              THEN round(avg(total) OVER w, 6) END AS trend,
         (day_ms // 86400000) % 7 AS dow
  FROM daily
  WINDOW w AS (ORDER BY day_ms ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
s AS (
  SELECT dow, round(avg(total - trend), 6) AS seasonal
  FROM t WHERE trend IS NOT NULL GROUP BY dow
)
SELECT t.day_ms, t.total, t.trend, t.dow, s.seasonal,
       CASE WHEN t.trend IS NOT NULL
            THEN round(t.total - t.trend - s.seasonal, 6) END AS resid
FROM t JOIN s ON t.dow = s.dow
"""


@register(
    "seasonal_decomp_daily",
    _SEASONAL_ORACLE,
    doc="additive seasonal decomposition of the daily value series: "
    "7-day centered-MA trend (full windows only) + day-of-week "
    "seasonal + residual — the corpus-sized scan reduces to a "
    "calendar-bounded daily table before any window runs; daily "
    "totals round before the window math so fold order cannot leak",
)
def q_seasonal_decomp_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.unix_millis(
                F.date_trunc("day", F.col("ts")).cast("timestamp")
            ).alias("day_ms")
        )
        .agg(F.round(F.sum("value"), 6).alias("total"))
    )
    # bounded input: the daily series is calendar-sized, so the
    # unpartitioned sliding window is O(days), never O(events)
    w7 = Window.orderBy("day_ms").rowsBetween(-3, 3)
    t = daily.select(
        "day_ms",
        "total",
        F.when(
            F.count("*").over(w7) == 7, F.round(F.avg("total").over(w7), 6)
        ).alias("trend"),
        (F.expr("day_ms div 86400000") % 7).alias("dow"),
    )
    s = (
        t.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(F.round(F.avg(F.col("total") - F.col("trend")), 6).alias("seasonal"))
    )
    return t.join(F.broadcast(s), "dow").select(
        "day_ms",
        "total",
        "trend",
        "dow",
        "seasonal",
        F.when(
            F.col("trend").isNotNull(),
            F.round(F.col("total") - F.col("trend") - F.col("seasonal"), 6),
        ).alias("resid"),
    )
