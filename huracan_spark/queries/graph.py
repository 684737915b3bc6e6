"""Graph analytics over the events-derived interaction graph.

The fixture graph is bipartite: users connect to the event types they
triggered (edges both directions so rank mass circulates).  PageRank
here is the third driver-checked ITERATIVE operator beside connected
components (dedup clustering) and spherical k-means (IVF training):
its oracle unrolls exactly PR_ITERS power-iteration rounds as
generated CTEs replaying ``operators/pagerank.py::pagerank_round``
bit-for-bit — per-round rounding at PR_ROUND_AT decimals pins the
double-sum fold-order difference between engines, the same contract
the Lloyd-step oracle uses (queries/similarity.py::_lloyd_sql).

Scale notes (see the operator docstring for the per-round shape):
nothing here is fixture-bound — at 100 TB the same query runs with
edges pre-partitioned by node id, contributions partial-agg combined
map-side, and lineage truncated per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.operators.pagerank import pagerank
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

PR_ITERS = 3
PR_DAMPING = 0.85
PR_ROUND_AT = 10  # per-round rank rounding (ulp-noise floor, see operator)
PR_TOP_K = 25


def _edges_sql() -> str:
    return """
ue AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                  't:' || event_type AS t
  FROM events
),
edges AS (
  SELECT u AS src, t AS dst FROM ue
  UNION ALL
  SELECT t AS src, u AS dst FROM ue
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, deg.out_deg
      FROM edges JOIN deg ON edges.src = deg.src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""


def _round_sql(k: int) -> str:
    """One unrolled power-iteration round: r{k-1} -> r{k}."""
    return f"""
c{k} AS (
  SELECT e.dst AS node, sum(r.rank / e.out_deg) AS m
  FROM e JOIN r{k - 1} r ON r.node = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT nd.node,
         round((1.0 - {PR_DAMPING}) / nn.n
               + {PR_DAMPING} * coalesce(c.m, 0.0), {PR_ROUND_AT}) AS rank
  FROM nodes nd CROSS JOIN nn LEFT JOIN c{k} c ON c.node = nd.node
)"""


_PAGERANK_ORACLE = (
    "WITH "
    + _edges_sql()
    + ","
    + ",".join(_round_sql(k) for k in range(1, PR_ITERS + 1))
    + f"""
SELECT node, round(rank, 8) AS rank
FROM r{PR_ITERS}
ORDER BY rank DESC, node
LIMIT {PR_TOP_K}
"""
)


@register(
    "pagerank_top_nodes",
    _PAGERANK_ORACLE,
    doc=f"PageRank ({PR_ITERS} power iterations, d={PR_DAMPING}) over the "
    "bipartite user<->event-type graph; top nodes by rank. Iterative "
    "DataFrame loop — one equi-join + partial-agg sum per round, no "
    "driver-side graph state; oracle unrolls the rounds as CTEs",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ue = (
        ev.select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
        )
        .distinct()
        .persist()
    )
    # eager: the operator reads `edges` from three branches (node set,
    # out-degree, the per-round join input) before its own caches fill —
    # materialize the distinct once so those branches don't re-run the
    # corpus scan+distinct
    ue.count()
    edges = ue.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionByName(
        ue.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    ranks = pagerank(
        edges, iterations=PR_ITERS, damping=PR_DAMPING, round_at=PR_ROUND_AT
    )
    # global top-K: TakeOrderedAndProject over the node-sized rank
    # table, never a single-partition window
    return (
        ranks.select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(PR_TOP_K)
    )


# -- triangle counting --------------------------------------------------------

# Nation-trade graph: an undirected edge links two nations when their
# customers/suppliers trade above the corpus-average intensity (a
# relative threshold, so the graph stays non-trivial at every scale
# factor).  Triangle counting uses the standard distributed algorithm:
# orient every edge from the lower-(degree, id) endpoint to the higher
# one, then one self-join of the oriented edge list plus one closing
# equi-join — each triangle is produced exactly once, and the join
# fan-out is bounded by the oriented out-degree (<= sqrt(2m) per node),
# the property that makes this the 100 TB algorithm (Suri & Vassilvitskii
# 2011) instead of the naive 3-way join over undirected edges.

TRI_ROUND = 6


def _tri_edges_sql() -> str:
    return """
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
deg AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT x AS node FROM kept UNION ALL SELECT y AS node FROM kept
  ) GROUP BY node
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (dx.d, k.x) < (dy.d, k.y) THEN k.x ELSE k.y END AS src,
         CASE WHEN (dx.d, k.x) < (dy.d, k.y) THEN k.y ELSE k.x END AS dst
  FROM kept k JOIN deg dx ON k.x = dx.node JOIN deg dy ON k.y = dy.node
),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oriented e1
  JOIN oriented e2 ON e1.dst = e2.src
  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
)"""


_TRIANGLE_ORACLE = (
    "WITH "
    + _tri_edges_sql()
    + """
SELECT n.n_name, count(*) AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) t JOIN nation n ON t.node = n.n_nationkey
GROUP BY n.n_name
"""
)


@register(
    "triangle_count_nations",
    _TRIANGLE_ORACLE,
    doc="per-node triangle counts over the above-average-intensity "
    "nation-trade graph, via degree-ordered edge orientation (Suri & "
    "Vassilvitskii): each triangle produced exactly once by one "
    "oriented self-join + one closing equi-join; join fan-out bounded "
    "by oriented out-degree, never the naive undirected 3-way join",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    und = (
        trades.groupBy(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        )
        .agg(F.count("*").alias("n_trades"))
        .persist()
    )
    # eager: und is nation-pair bounded (tiny) but its input is the
    # corpus-sized 4-way trade join — the avg_n BROADCAST branch and
    # the kept filter branch would otherwise each run that join (and
    # race the lazy cache fill, r7 class); one count() runs it once
    und.count()
    avg_n = und.agg(F.avg("n_trades").alias("avg_n"))
    # the thresholded edge list is node-bounded (<= |nations|^2 rows) and
    # referenced by deg/oriented/e1/e2/e3 — persist it so the corpus-sized
    # 4-way trade join is planned and executed ONCE, not once per branch
    kept = (
        und.crossJoin(F.broadcast(avg_n))
        .filter(F.col("n_trades") > F.col("avg_n"))
        .select("x", "y")
        .persist()
    )
    kept.count()  # eager: read by 2-3 downstream branches
    deg = (
        kept.select(F.col("x").alias("node"))
        .unionByName(kept.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    with_deg = kept.join(dx, "x").join(dy, "y")
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = with_deg.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
    ).persist()  # three self-join branches read this edge-bounded table
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return (
        nodes.join(F.broadcast(nation), nodes.node == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_triangles"))
    )


# -- BFS minimum-hop distances ------------------------------------------------

BFS_ROUNDS = 3  # >= diameter of the thresholded trade graph


def _bfs_round_sql(k: int) -> str:
    # d{k-1} is referenced twice per round — without AS MATERIALIZED,
    # DuckDB's default inlining re-evaluates the chain 2^rounds times
    # (the exact blowup that OOM'd the k-core oracle under the 24GB cap).
    return f"""
d{k} AS MATERIALIZED (
  SELECT node, min(hops) AS hops FROM (
    SELECT node, hops FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, d.hops + 1 AS hops
    FROM d{k - 1} d JOIN bi e ON d.node = e.src
  ) GROUP BY node
)"""


_BFS_ORACLE = (
    "WITH "
    + _tri_edges_sql().split(",\ntri AS")[0]  # trades/und/kept/deg/oriented
    + f""",
bi AS MATERIALIZED (
  SELECT x AS src, y AS dst FROM kept
  UNION ALL
  SELECT y AS src, x AS dst FROM kept
),
src0 AS (SELECT min(src) AS s FROM bi),
d0 AS (SELECT s AS node, 0 AS hops FROM src0),
{",".join(_bfs_round_sql(k) for k in range(1, BFS_ROUNDS + 1))}
SELECT n.n_name, d.hops
FROM d{BFS_ROUNDS} d JOIN nation n ON d.node = n.n_nationkey
"""
)


@register(
    "bfs_trade_hops",
    _BFS_ORACLE,
    doc=f"BFS minimum-hop distances ({BFS_ROUNDS} rounds) from the "
    "lowest-id nation over the above-average-intensity trade graph — "
    "iterative frontier expansion: one equi-join + partial-agg min per "
    "round, localCheckpoint lineage truncation, no driver graph state; "
    "oracle unrolls the rounds as CTEs (operators/bfs.py)",
)
def q_bfs_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.bfs import bfs_hops

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
    und = (
        trades.groupBy(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        )
        .agg(F.count("*").alias("n_trades"))
        .persist()
    )
    # eager: und is nation-pair bounded (tiny) but its input is the
    # corpus-sized 4-way trade join — the avg_n BROADCAST branch and
    # the kept filter branch would otherwise each run that join (and
    # race the lazy cache fill, r7 class); one count() runs it once
    und.count()
    avg_n = und.agg(F.avg("n_trades").alias("avg_n"))
    kept = (
        und.crossJoin(F.broadcast(avg_n))
        .filter(F.col("n_trades") > F.col("avg_n"))
        .select("x", "y")
        .persist()
    )
    kept.count()  # eager: read by 2-3 downstream branches
    bi = kept.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        kept.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    source = bi.agg(F.min("src")).collect()[0][0]  # O(1) scalar, like kmeans
    dist = bfs_hops(bi, F.lit(source), rounds=BFS_ROUNDS)
    return dist.join(F.broadcast(nation), dist.node == nation.n_nationkey).select(
        "n_name", "hops"
    )


# -- personalized PageRank: related parts -------------------------------------

PPR_ITERS = 3
PPR_DAMPING = 0.85
PPR_ROUND_AT = 10
PPR_TOP_K = 15


def _ppr_round_sql(k: int) -> str:
    return f"""
c{k} AS (
  SELECT e.dst AS node, sum(r.rank / e.out_deg) AS m
  FROM e JOIN r{k - 1} r ON r.node = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT nd.node,
         round((1.0 - {PPR_DAMPING}) * CASE WHEN nd.node = src0.p THEN 1.0
                                            ELSE 0.0 END
               + {PPR_DAMPING} * coalesce(c.m, 0.0), {PPR_ROUND_AT}) AS rank
  FROM nodes nd CROSS JOIN src0 LEFT JOIN c{k} c ON c.node = nd.node
)"""


_PPR_ORACLE = (
    """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS n
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
e0 AS (
  SELECT x AS src, y AS dst FROM pairs
  UNION ALL SELECT y AS src, x AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM e0),
deg AS (SELECT src, count(*) AS out_deg FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, deg.out_deg FROM e0 JOIN deg ON e0.src = deg.src),
src0 AS (
  SELECT l_partkey AS p FROM lp GROUP BY l_partkey
  ORDER BY count(*) DESC, l_partkey LIMIT 1
),
r0 AS (
  SELECT nd.node, CASE WHEN nd.node = src0.p THEN 1.0 ELSE 0.0 END AS rank
  FROM nodes nd CROSS JOIN src0
),"""
    + ",".join(_ppr_round_sql(k) for k in range(1, PPR_ITERS + 1))
    + f"""
SELECT r.node AS part_id, round(r.rank, 6) AS rank
FROM r{PPR_ITERS} r CROSS JOIN src0
WHERE r.node <> src0.p AND r.rank > 0
ORDER BY rank DESC, part_id
LIMIT {PPR_TOP_K}
"""
)


@register(
    "related_parts_ppr",
    _PPR_ORACLE,
    doc=f"personalized PageRank ({PPR_ITERS} rounds, d={PPR_DAMPING}) over "
    "the co-purchase graph, teleporting to the most-ordered part — the "
    "related-items recommendation primitive; same per-round shape as "
    "pagerank (one equi-join + partial-agg sum), oracle unrolls rounds",
)
def q_related_parts_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.pagerank import personalized_pagerank
    from huracan_spark.queries.relational import basket_pairs_shared

    # the co-purchase graph (lp incidence + support>=2 pair table) is
    # the shared market-basket artifact — built once per (app, sf_dir)
    # under the `basket:pairs` group; copurchase_pairs reports on the
    # same tables.  BASKET_MIN_SUPPORT == 2 == this query's oracle's
    # HAVING count(*) >= 2.
    lp, pairs = basket_pairs_shared(spark, sf_dir)
    edges = pairs.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        pairs.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    source = (
        lp.groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "l_partkey")
        .limit(1)
        .collect()[0]
        .l_partkey
    )  # O(1) driver scalar
    reset = spark.createDataFrame([(source, 1.0)], "node long, reset double")
    ranks = personalized_pagerank(
        edges,
        reset,
        iterations=PPR_ITERS,
        damping=PPR_DAMPING,
        round_at=PPR_ROUND_AT,
    )
    return (
        ranks.filter((F.col("node") != source) & (F.col("rank") > 0))
        .select(F.col("node").alias("part_id"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "part_id")
        .limit(PPR_TOP_K)
    )
