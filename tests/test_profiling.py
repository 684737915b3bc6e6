"""Profiling-primitive tests: equi-width histogram, per-group OLS
trend, substring-block dedup. Oracle harness does value parity; these
pin invariants and plan shapes."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from huracan_spark.queries.dedup import (
    SUB_BLOCK_K,
    SUB_BLOCK_STRIDE,
    q_substring_dup_blocks,
)
from huracan_spark.queries.extended import (
    HIST_BIN_WIDTH,
    q_value_histogram,
    q_value_trend,
)
from huracan_spark.queries.registry import REGISTRY, spark_queries
from huracan_spark.sources.tables import load_table

spark_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return (
        REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_histogram_partitions_all_events(spark, sf_dir):
    rows = q_value_histogram(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert r.bin_lo == r.bin * HIST_BIN_WIDTH


def test_histogram_single_scan_no_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "value_histogram")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p and "Window" not in p
    assert "partial_count" in p  # map-side combine before the shuffle


def test_trend_matches_numpy_polyfit(spark, sf_dir):
    """The moment-sum fit must agree with an independent per-group
    least-squares (numpy lstsq) to tight tolerance."""
    from huracan_spark.queries.extended import TREND_ANCHOR_US, _US_PER_DAY

    got = {r.event_type: r for r in q_value_trend(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    pdf = ev.toPandas()
    pdf["x"] = (
        pdf["ts"].astype("int64") // 1000 - TREND_ANCHOR_US
    ) / _US_PER_DAY
    for t, g in pdf.groupby("event_type"):
        slope, intercept = np.polyfit(g["x"], g["value"], 1)
        assert abs(got[t].slope_per_day - slope) < 1e-4
        assert abs(got[t].intercept - intercept) < 1e-3
        assert 0.0 <= got[t].r2 <= 1.0


def test_trend_single_scan_partial_agg(spark, sf_dir):
    p = _plan(spark, sf_dir, "value_trend_per_type")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p and "Window" not in p
    assert "partial_" in p


def test_substring_blocks_detect_planted_boilerplate(spark):
    """Two docs sharing a long verbatim block must collide on at least
    one window hash; unrelated docs must not."""
    import huracan_spark.queries.dedup as D

    shared = "THIS IS A SHARED LICENSE HEADER BLOCK OF TEXT!"
    assert len(shared) >= SUB_BLOCK_K + SUB_BLOCK_STRIDE
    # prefix lengths differ by a MULTIPLE OF THE STRIDE: window starts
    # then hit the same block-relative offsets in both docs.  (With
    # misaligned prefixes detection is not guaranteed — the documented
    # stride trade; see the operator comment.)
    p1, p2 = "intro words ", "other start section "  # 12 and 20 chars
    assert (len(p2) - len(p1)) % SUB_BLOCK_STRIDE == 0
    docs = spark.createDataFrame(
        [
            (1, p1 + shared + " tail one"),
            (2, p2 + shared + " different tail"),
            (3, "completely unrelated content with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    orig = D._docs
    try:
        D._docs = lambda *_: docs
        rows = q_substring_dup_blocks(None, None).collect()
    finally:
        D._docs = orig
    assert rows  # the planted block is found
    for r in rows:
        assert r.n_docs == 2 and r.n_occurrences >= 2


def test_substring_blocks_plan_linear(spark, sf_dir):
    p = _plan(spark, sf_dir, "substring_dup_blocks")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert "Generate" in p  # the window explode is the linear path


# -- forward as-of -----------------------------------------------------------


def test_asof_forward_picks_earliest_at_or_after(spark):
    from huracan_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 1, 10), ("u", 2, 25), ("u", 3, 99)], ["k", "lid", "t"]
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("u", 30, 3.0)], ["k", "rt", "v"]
    )
    got = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["v"], direction="forward",
        ).collect()
    }
    assert got[1].rt_asof == 10 and got[1].v_asof == 1.0  # inclusive >=
    assert got[2].rt_asof == 30 and got[2].v_asof == 3.0  # earliest after
    assert got[3].rt_asof is None and got[3].v_asof is None  # none after


def test_asof_direction_validation(spark):
    from huracan_spark.operators.asof import asof_join

    df = spark.range(1).select(F.lit("k").alias("k"), F.lit(1).alias("t"))
    try:
        asof_join(df, df, on="k", left_time="t", right_time="t",
                  direction="nearest")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# -- audit checksums ---------------------------------------------------------


def test_checksum_order_and_partitioning_invariant(spark, sf_dir):
    from huracan_spark.queries.extended import q_audit_checksums

    base = sorted(map(tuple, q_audit_checksums(spark, sf_dir).collect()))
    # same rows, different physical layout -> identical checksums
    import huracan_spark.queries.extended as E

    orig = E._events
    try:
        E._events = lambda s, d: orig(s, d).repartition(7).sortWithinPartitions(
            F.col("value").desc()
        )
        shuffled = sorted(map(tuple, q_audit_checksums(spark, sf_dir).collect()))
    finally:
        E._events = orig
    assert base == shuffled


def test_checksum_detects_single_row_mutation(spark, sf_dir):
    import huracan_spark.queries.extended as E
    from huracan_spark.queries.extended import q_audit_checksums

    base = dict(
        (r.event_type, r.checksum)
        for r in q_audit_checksums(spark, sf_dir).collect()
    )
    orig = E._events
    try:
        E._events = lambda s, d: orig(s, d).withColumn(
            "value",
            F.when(F.col("event_id") == 42, F.col("value") + 0.01).otherwise(
                F.col("value")
            ),
        )
        mutated = dict(
            (r.event_type, r.checksum)
            for r in q_audit_checksums(spark, sf_dir).collect()
        )
    finally:
        E._events = orig
    assert sum(1 for t in base if base[t] != mutated[t]) == 1


# -- daily z-scores ----------------------------------------------------------


def test_zscore_flags_match_threshold(spark, sf_dir):
    from huracan_spark.queries.extended import Z_FLAG, q_daily_zscores

    rows = q_daily_zscores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.is_anomaly == (1 if abs(r.zscore) >= Z_FLAG else 0)
    # z-scores within a type must average ~0 by construction
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.zscore)
    for zs in by_type.values():
        assert abs(sum(zs) / len(zs)) < 1e-3


def test_checksum_mergeable_across_batches(spark, sf_dir):
    """The scale contract: per-shard partial checksums combine (xor /
    sum) into exactly the full-table checksum — no re-scan needed."""
    import huracan_spark.queries.extended as E
    from huracan_spark.queries.extended import q_audit_checksums

    full = {
        r.event_type: (r.n_rows, r.checksum)
        for r in q_audit_checksums(spark, sf_dir).collect()
    }
    orig = E._events
    parts = []
    try:
        for rem in (0, 1):
            E._events = lambda s, d, rem=rem: orig(s, d).filter(
                F.col("event_id") % 2 == rem
            )
            parts.append(
                {
                    r.event_type: (r.n_rows, r.checksum)
                    for r in q_audit_checksums(spark, sf_dir).collect()
                }
            )
    finally:
        E._events = orig
    merged = {}
    for p in parts:
        for t, (n, ck) in p.items():
            mn, mck = merged.get(t, (0, 0))
            merged[t] = (mn + n, mck ^ ck)
    assert merged == full
