"""Physical-layout scale guarantees on NATIVE Spark table formats:
bucketed tables join without a shuffle, and day-partitioned writes
prune partitions at the scan.  (The silver table implements its own
manifest bucketing — these tests pin the same properties on the
built-in `bucketBy` / `partitionBy` paths a warehouse deployment
would use.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from huracan_spark.sources.tables import load_table


@pytest.fixture()
def warehouse_tables(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key into the session warehouse."""
    ev = load_table(spark, sf_dir, "events").limit(20000)
    users = (
        ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    for name in ("t_ev_bucketed", "t_users_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        ev.write.bucketBy(8, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable("t_ev_bucketed")
    )
    (
        users.write.bucketBy(8, "user_id")
        .mode("overwrite")
        .saveAsTable("t_users_bucketed")
    )
    yield "t_ev_bucketed", "t_users_bucketed"
    for name in ("t_ev_bucketed", "t_users_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_tables_join_without_shuffle(spark, warehouse_tables):
    """Co-located join: when both sides are bucketed on the join key
    with the same bucket count, the sort-merge join must read buckets
    directly — NO Exchange on either side.  This is the layout that
    turns the 100 TB fact-to-fact join from a full shuffle into a
    local merge."""
    ev_t, users_t = warehouse_tables
    # disable broadcast so the join strategy decision is about shuffle,
    # not size; restore after
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ev_t).join(spark.table(users_t), "user_id").select(
            "user_id", "event_type", "n_events"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaced the shuffle
        # and the result is still correct
        assert j.count() == spark.table(ev_t).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    """A day-partitioned parquet layout must turn a day filter into
    listing-time partition pruning — the scan's partition filter, not a
    post-scan filter over all files."""
    ev = load_table(spark, sf_dir, "events").limit(20000).withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "ev_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    days = [r.day for r in spark.read.parquet(out).select("day").distinct().collect()]
    target = sorted(days)[0]
    q = spark.read.parquet(out).filter(F.col("day") == F.lit(target))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(day" in plan
    # correctness: pruned read equals post-hoc filter of the full read
    full = spark.read.parquet(out).collect()
    want = sum(1 for r in full if r.day == target)
    assert q.count() == want > 0


def test_range_partitioned_write_is_totally_ordered(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions = the distributed
    total-order write (range partitioner samples boundaries, each task
    sorts locally — no single-partition global sort).  Files must be
    non-overlapping in key ranges and ordered within."""
    ev = load_table(spark, sf_dir, "events").limit(20000)
    plan = (
        ev.repartitionByRange(8, "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning(event_id" in plan.lower()

    out = str(tmp_path / "ev_ranged")
    (
        ev.repartitionByRange(8, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob
    import os

    ranges = []
    for f in glob.glob(os.path.join(out, "part-*.parquet")):
        ids = [r.event_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)  # ordered within the file
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # files cover disjoint, ordered key ranges


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: with one hot key dominating the left
    side, the runtime must mark the sort-merge join as skewed and split
    the hot partition — the mechanism that saves the 100 TB skewed
    join without manual salting (salting remains for aggregations,
    operators/salting.py)."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thr = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", None
    )
    prev_adv = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", None
    )
    prev_factor = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        from pyspark.sql import functions as F2

        left = spark.range(200_000).select(
            F2.when(F2.col("id") % 10 < 9, F2.lit(0))
            .otherwise(F2.col("id"))
            .alias("k"),
            F2.col("id").alias("v"),
        )
        right = spark.range(2_000).select(
            F2.col("id").alias("k"), (F2.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        # collect() drives THIS DataFrame's queryExecution, so AQE
        # finalizes the plan we inspect (count() would execute a clone)
        rows = j.collect()
        assert len(rows) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        for key, prev in [
            (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                prev_thr,
            ),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_adv),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prev_factor),
        ]:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def test_compact_respects_target_file_size(spark, tmp_path):
    """compact(max_records_per_file=N) must split big buckets into
    multiple files of at most N records (the OPTIMIZE target-size
    knob), and the table stays readable through the manifest."""
    import glob

    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(4000)],
            "_id string, version_ long, deleted boolean",
        )
    )
    gen = silver.compact(max_records_per_file=500)
    files = glob.glob(
        str(tmp_path / "s" / gen / "_bucket=*" / "*.parquet")
    )
    assert len(files) >= 8  # 4000 rows / 500 cap across 2 buckets
    for f in files:
        assert spark.read.parquet(f).count() <= 500
    assert silver.read().count() == 4000
