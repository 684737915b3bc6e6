"""Operator semantics tests: compaction (K1/K2), islands (A7), pagination (Q9)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from huracan_spark.operators.compaction import (
    latest_state,
    latest_state_window,
    merge_into,
)
from huracan_spark.operators.islands import descending_ranges
from huracan_spark.operators.pagination import paginate


def test_islands_reference_case(spark):
    """The reference's only unit test (main/src/utils.rs:39-48):
    [3,1,2,7,9,11,10] -> [(11,9),(7,7),(3,1)]."""
    df = spark.createDataFrame([(i,) for i in [3, 1, 2, 7, 9, 11, 10]], ["checkpoint_id"])
    out = [(r.range_end, r.range_start) for r in descending_ranges(df).collect()]
    assert out == [(11, 9), (7, 7), (3, 1)]


def test_islands_empty(spark):
    df = spark.createDataFrame([], "checkpoint_id long")
    assert descending_ranges(df).count() == 0


def test_islands_duplicates(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (4,)], ["checkpoint_id"])
    out = [(r.range_end, r.range_start) for r in descending_ranges(df).collect()]
    assert out == [(4, 4), (2, 1)]


def _change_stream(spark, rows):
    return spark.createDataFrame(
        rows, "id string, version long, deleted boolean, payload string"
    )


def test_latest_state_picks_max_version(spark):
    rows = [
        ("a", 1, False, "a1"),
        ("a", 3, False, "a3"),
        ("a", 2, False, "a2"),
        ("b", 1, False, "b1"),
    ]
    out = latest_state(_change_stream(spark, rows), "id", "version")
    state = {r.id: (r.version, r.payload) for r in out.collect()}
    assert state == {"a": (3, "a3"), "b": (1, "b1")}


def test_latest_state_equals_window_variant(spark):
    random.seed(42)
    rows = [
        (f"obj{i % 17}", v, False, f"p{i%17}-{v}")
        for i, v in enumerate(random.sample(range(1000), 400))
    ]
    df = _change_stream(spark, rows)
    a = sorted(map(tuple, latest_state(df, "id", "version").collect()))
    b = sorted(map(tuple, latest_state_window(df, "id", "version").collect()))
    assert a == b


def test_latest_state_order_independent_and_idempotent(spark):
    """K1 contract (etl.rs:1245-1247): replaying any permutation with
    duplicates converges to the same state."""
    base = [
        ("a", 1, False, "a1"),
        ("a", 2, False, "a2"),
        ("b", 5, False, "b5"),
        ("b", 4, False, "b4"),
        ("c", 9, True, None),
        ("c", 7, False, "c7"),
    ]
    random.seed(7)
    expected = None
    for _ in range(3):
        perm = base[:] + random.sample(base, 3)  # duplicates too
        random.shuffle(perm)
        out = sorted(
            map(tuple, latest_state(_change_stream(spark, perm), "id", "version").collect())
        )
        if expected is None:
            expected = out
        assert out == expected
    # tombstone at max version survives (K2: delete is final)
    state = {t[0]: t for t in expected}
    assert state["c"][2] is True and state["c"][3] is None


def test_merge_into_version_guard(spark):
    """MERGE only replaces when incoming version is higher (K1)."""
    current = _change_stream(spark, [("a", 5, False, "a5"), ("b", 1, False, "b1")])
    batch = _change_stream(
        spark,
        [
            ("a", 3, False, "a3-stale"),  # stale: must NOT win
            ("b", 2, False, "b2"),  # newer: must win
            ("c", 1, False, "c1"),  # new key: insert
        ],
    )
    out = {r.id: (r.version, r.payload) for r in merge_into(current, batch, "id", "version").collect()}
    assert out == {"a": (5, "a5"), "b": (2, "b2"), "c": (1, "c1")}


def test_merge_tombstone_then_stale_update(spark):
    """K2 truth table: a tombstone at version 9 beats a late update at 7."""
    current = _change_stream(spark, [("x", 9, True, None)])
    batch = _change_stream(spark, [("x", 7, False, "x7-late")])
    out = merge_into(current, batch, "id", "version").collect()
    assert len(out) == 1
    assert out[0].deleted is True and out[0].payload is None


def test_merge_equal_version_truth_table(spark):
    """Equal-version tie-break truth table (the r4 hypothesis
    counterexample class): a bare version column is not a total order,
    so MERGE resolves ties deterministically — tombstone beats live at
    the same version ("delete is final", etl.rs:1238-1247), and stored
    beats incoming otherwise (Delta's strictly-greater guard).

    Cases (stored vs incoming at the SAME version):
      live    vs live'     -> stored live wins (no arbitrary overwrite)
      tomb    vs live      -> tombstone survives (no resurrection)
      live    vs tomb      -> tombstone wins (late delete lands)
      tomb    vs tomb      -> tombstone (idempotent replay)
    And strictly-higher versions still win regardless of deleted flag.
    """
    current = _change_stream(
        spark,
        [
            ("ll", 6, False, "stored"),
            ("tl", 6, True, None),
            ("lt", 6, False, "stored"),
            ("tt", 6, True, None),
            ("hi", 6, True, None),  # higher live version must resurrect
        ],
    )
    batch = _change_stream(
        spark,
        [
            ("ll", 6, False, "incoming"),
            ("tl", 6, False, "resurrect-attempt"),
            ("lt", 6, True, None),
            ("tt", 6, True, None),
            ("hi", 7, False, "reborn"),
        ],
    )
    out = {
        r.id: (r.version, r.deleted, r.payload)
        for r in merge_into(current, batch, "id", "version").collect()
    }
    assert out == {
        "ll": (6, False, "stored"),
        "tl": (6, True, None),
        "lt": (6, True, None),
        "tt": (6, True, None),
        "hi": (7, False, "reborn"),
    }


def test_merge_equal_version_in_batch_and_order_independent(spark):
    """The same tie-break must hold WITHIN a batch (pre-reduce) and be
    independent of which batch boundary splits the tie."""
    empty = _change_stream(spark, []).limit(0)
    tomb = ("x", 6, True, None)
    live = ("x", 6, False, "late-live")

    # in one batch: tombstone wins the tie
    both = _change_stream(spark, [tomb, live])
    out = merge_into(empty, both, "id", "version").collect()
    assert len(out) == 1 and out[0].deleted is True

    # split across batches, both orders: converge to the tombstone
    for first, second in [(tomb, live), (live, tomb)]:
        s1 = merge_into(empty, _change_stream(spark, [first]), "id", "version")
        s2 = merge_into(s1, _change_stream(spark, [second]), "id", "version")
        rows = s2.collect()
        assert len(rows) == 1 and rows[0].deleted is True, (first, second)


def test_paginate_deterministic(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    page = [r.k for r in paginate(df, "k", limit=10, offset=25).collect()]
    assert page == list(range(25, 35))


def test_bucketed_range_join_matches_naive(spark):
    """Bucket-explode strategy must equal the naive containment join,
    including ranges spanning many buckets and points on boundaries."""
    from huracan_spark.operators.range_join import bucketed_range_join

    points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], ["pid", "x"]
    )
    ranges = spark.createDataFrame(
        [
            (0, 0, 10),     # within one bucket
            (1, 5, 45),     # spans several buckets
            (2, 95, 100),   # touches the top edge (hi exclusive)
            (3, 10, 10),    # empty range (lo == hi)
            (4, 0, 100),    # covers everything
        ],
        ["rid", "lo", "hi"],
    )
    got = sorted(
        (r.pid, r.rid)
        for r in bucketed_range_join(
            points, ranges, "x", "lo", "hi", bucket_width=8
        ).collect()
    )
    naive = sorted(
        (p, rid)
        for p, x in [(i, i * 7 % 100) for i in range(200)]
        for rid, lo, hi in [(0, 0, 10), (1, 5, 45), (2, 95, 100), (3, 10, 10), (4, 0, 100)]
        if lo <= x < hi
    )
    assert got == naive


def test_bucketed_range_join_no_nested_loop(spark):
    """The plan must be a hash join on the synthetic bucket key, not
    BroadcastNestedLoopJoin — that is the whole point at 100 TB."""
    from huracan_spark.operators.range_join import bucketed_range_join

    points = spark.range(100).withColumnRenamed("id", "x")
    ranges = spark.createDataFrame([(0, 10, 50)], ["rid", "lo", "hi"])
    plan = bucketed_range_join(
        points, ranges, "x", "lo", "hi", bucket_width=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_salted_aggregate_equals_plain(spark):
    from huracan_spark.operators.salting import salted_aggregate

    df = spark.createDataFrame(
        [("hot", i % 7, float(i)) for i in range(500)]
        + [("cold", i, float(i)) for i in range(20)],
        ["k", "m", "v"],
    )
    got = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in salted_aggregate(
            df,
            ["k"],
            [("v", "sum", "total"), ("v", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")],
            n_salts=8,
        ).collect()
    }
    want = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark):
    from huracan_spark.operators.salting import salted_join

    fact = spark.createDataFrame(
        [(i % 3, i, float(i) * 2) for i in range(300)], ["k", "seq", "v"]
    )
    dim = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], ["k", "name"])
    got = sorted(
        (r.k, r.seq, r.v, r.name)
        for r in salted_join(fact, dim, "k", n_salts=4).collect()
    )
    want = sorted(
        (r.k, r.seq, r.v, r.name) for r in fact.join(dim, "k").collect()
    )
    assert got == want


def test_salted_aggregate_rejects_non_decomposable(spark):
    from huracan_spark.operators.salting import salted_aggregate

    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_aggregate(df, ["k"], [("v", "avg", "m")])


def test_asof_join_backward_semantics(spark):
    from huracan_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10), ("a", 4), ("b", 7)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("a", 5, "a5"), ("a", 10, "a10"), ("b", 8, "b8")], ["k", "rt", "val"]
    )
    out = {
        (r.k, r.t): (r.rt_asof, r.val_asof)
        for r in asof_join(left, right, "k", "t", "rt", ["val"]).collect()
    }
    # greatest rt <= t; equal time matches (<=); no prior row -> nulls
    assert out == {
        ("a", 10): (10, "a10"),
        ("a", 4): (None, None),
        ("b", 7): (None, None),
    }


def test_asof_join_duplicate_right_ties_deterministic(spark):
    """Duplicate right rows at the same (key, time) must resolve the
    same way on every run/partitioning: greatest payload struct wins
    (the tie-break column in the window order — VERDICT r2 item 7)."""
    from huracan_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 10), ("a", 20)], ["k", "t"])
    dup_rows = [("a", 5, "v1"), ("a", 5, "v3"), ("a", 5, "v2")]
    results = set()
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(dup_rows, ["k", "rt", "val"]).repartition(
            nparts
        )
        got = tuple(
            sorted(
                (r.k, r.t, r.rt_asof, r.val_asof)
                for r in asof_join(left, right, "k", "t", "rt", ["val"]).collect()
            )
        )
        results.add(got)
    assert results == {
        (("a", 10, 5, "v3"), ("a", 20, 5, "v3"))
    }


def test_bucketed_range_join_left_outer_preserves_points(spark):
    """how='left' keeps points matched by bucket but not containment,
    and points in empty buckets — each exactly once, null-extended."""
    from huracan_spark.operators.range_join import bucketed_range_join

    points = spark.createDataFrame(
        [(0, 5), (1, 55), (2, 12), (3, 99)], ["pid", "x"]
    )
    ranges = spark.createDataFrame([(0, 0, 10), (1, 50, 60)], ["rid", "lo", "hi"])
    out = sorted(
        (r.pid, r.rid)
        for r in bucketed_range_join(
            points, ranges, "x", "lo", "hi", bucket_width=8, how="left"
        ).collect()
    )
    # pid 2 (x=12, bucket 1 = range 0's last bucket, containment fails)
    # and pid 3 (x=99, no range bucket) both survive with null rid
    assert out == [(0, 0), (1, 1), (2, None), (3, None)]


def test_bucketed_range_join_rejects_right_outer(spark):
    from huracan_spark.operators.range_join import bucketed_range_join
    import pytest as _pytest

    points = spark.range(10).withColumnRenamed("id", "x")
    ranges = spark.createDataFrame([(0, 1, 5)], ["rid", "lo", "hi"])
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            bucketed_range_join(points, ranges, "x", "lo", "hi", 4, how=how)


def test_global_cumsum_matches_single_partition_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from huracan_spark.operators.prefix_sum import global_cumsum

    rows = [(i, (i * 37) % 11 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        (r.k, r.cumsum)
        for r in global_cumsum(df, "v", "k", out_col="cumsum").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.k, r.cumsum)
        for r in df.withColumn("cumsum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_cumsum_plan_has_no_unpartitioned_window(spark):
    from huracan_spark.operators.prefix_sum import global_cumsum

    df = spark.range(100).selectExpr("id AS k", "id % 5 AS v")
    plan = (
        global_cumsum(df, "v", "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every window spec must be partitioned (by the physical partition
    # id) — an empty partition spec is the single-partition funnel
    for frag in plan.split("windowspecdefinition(")[1:]:
        assert frag.split(",")[0].strip().startswith("_pid"), frag[:80]
