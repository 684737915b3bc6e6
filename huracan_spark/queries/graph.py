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
    )
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
