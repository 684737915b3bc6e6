"""PageRank operator + query, char-entropy and ranking-window tests.
Cross-engine value parity is the oracle harness's job; these pin the
algorithmic invariants and plan shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from huracan_spark.operators.pagerank import pagerank
from huracan_spark.queries.registry import REGISTRY, spark_queries
from huracan_spark.queries.text import q_char_entropy

spark_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return (
        REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


# -- pagerank operator -------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_mass_conserved_on_cycle(spark):
    """On a cycle every node has out-deg 1 — no dangling leak, so total
    mass stays exactly 1 and symmetry forces uniform ranks."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = pagerank(e, iterations=5).collect()
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r.rank - 1 / 3) < 1e-9


def test_pagerank_star_center_dominates(spark):
    """Spokes pointing at a hub: the hub must out-rank every spoke, and
    spokes (in-degree 1 from the hub each... none here) share rank."""
    e = _edges(
        spark, [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    )
    rows = {r.node: r.rank for r in pagerank(e, iterations=10).collect()}
    assert rows["hub"] > rows["s2"]
    assert rows["hub"] > rows["s3"]
    # s2/s3 have no in-edges at all -> exactly the teleport floor
    assert abs(rows["s2"] - rows["s3"]) < 1e-12


def test_pagerank_deterministic_across_runs(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    r1 = sorted(map(tuple, pagerank(e, iterations=4, round_at=10).collect()))
    r2 = sorted(map(tuple, pagerank(e, iterations=4, round_at=10).collect()))
    assert r1 == r2


def test_pagerank_hand_computed_two_nodes(spark):
    """a<->b symmetric: closed form rank = 0.5 each at every iteration."""
    e = _edges(spark, [("a", "b"), ("b", "a")])
    for r in pagerank(e, iterations=3).collect():
        assert abs(r.rank - 0.5) < 1e-12


# -- pagerank query plan (100 TB shape) --------------------------------------


def test_pagerank_query_no_cartesian_partial_sum(spark, sf_dir):
    spark.catalog.clearCache()
    p = _plan(spark, sf_dir, "pagerank_top_nodes")
    assert "CartesianProduct" not in p
    # contribution sum must combine map-side before the dst shuffle
    assert "partial_sum" in p
    # global top-K is TakeOrdered, not a single-partition sort/window
    assert "TakeOrderedAndProject" in p


# -- char entropy ------------------------------------------------------------


def test_char_entropy_bounds(spark, sf_dir):
    rows = q_char_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.char_entropy >= -1e-9
        # H <= log2(alphabet size), with rounding slack
        assert r.char_entropy <= math.log2(r.n_distinct_chars) + 1e-6


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    import huracan_spark.queries.text as T

    orig = T._docs
    try:
        T._docs = lambda *_: df
        got = {r.doc_id: r for r in q_char_entropy(None, None).collect()}
    finally:
        T._docs = orig
    assert got[1].char_entropy == 0.0 and got[1].n_distinct_chars == 1
    assert abs(got[2].char_entropy - 1.0) < 1e-9
    assert abs(got[3].char_entropy - 2.0) < 1e-9


def test_entropy_plan_linear_no_window(spark, sf_dir):
    spark.catalog.clearCache()
    p = _plan(spark, sf_dir, "doc_char_entropy")
    assert "Window" not in p
    assert "CartesianProduct" not in p


# -- ranking windows ---------------------------------------------------------


def test_ntile_quartiles_cover_each_type(spark, sf_dir):
    rows = REGISTRY["ntile_quartile_stats"].fn(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert sorted(r.quartile for r in rs) == [1, 2, 3, 4]
        # quartile value ranges must be non-overlapping and ordered
        rs = sorted(rs, key=lambda r: r.quartile)
        for lo, hi in zip(rs, rs[1:]):
            assert lo.max_value <= hi.min_value + 1e-9
        # the last quartile's cume_dist reaches exactly 1
        assert abs(rs[-1].max_cume_dist - 1.0) < 1e-12


def test_ntile_window_partitioned_not_global(spark, sf_dir):
    p = _plan(spark, sf_dir, "ntile_quartile_stats")
    assert "Window" in p
    # partitioned by event_type -> hashpartitioning exchange, never a
    # SinglePartition window over the whole corpus
    assert "SinglePartition" not in p
