"""Physical-plan regression tests: the scale properties we rely on
(pushdown, broadcast, partial aggregation, no accidental cartesian
products) must survive refactors — these are the 100 TB guarantees."""

from __future__ import annotations

import pytest

from huracan_spark.queries.registry import REGISTRY, spark_queries

spark_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "type_prefix_filter")
    assert "StringStartsWith(event_type,p)" in p  # pushed, not post-filtered
    p = _plan(spark, sf_dir, "point_lookup")
    assert "EqualTo(event_id,42)" in p


def test_column_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "count_per_type")
    # only event_type should be read for a per-type count
    assert "ReadSchema: struct<event_type:string>" in p


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "dynamic_field_join"])
def test_dim_joins_are_broadcast(spark, sf_dir, name):
    p = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_asof_join_is_window_not_rangejoin(spark, sf_dir):
    """The as-of operator must never plan a range cross-join."""
    p = _plan(spark, sf_dir, "asof_join_purchases")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_latest_state_partial_aggregation(spark, sf_dir):
    """K1 compaction must partially aggregate map-side so only one
    candidate row per key crosses the shuffle."""
    p = _plan(spark, sf_dir, "latest_state")
    assert "partial_max_by" in p
    assert p.index("partial_max_by") > p.index("Exchange")  # partial below exchange


def test_lsh_signature_is_shuffle_free_per_row(spark, sf_dir):
    """ann_lsh signatures: one scan, no explode/shuffle before groupBy."""
    p = _plan(spark, sf_dir, "ann_lsh_buckets")
    assert "Generate" not in p  # no explode
    assert p.count("Exchange") == 1  # only the final groupBy(sig)
