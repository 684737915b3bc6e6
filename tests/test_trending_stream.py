"""Event-time exponential-decay trending counters: streaming state must
converge to the batch twin across micro-batch boundaries."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
    ]
)

HALF_LIFE = "30 minutes"


def _rows(spark, *specs):
    return spark.createDataFrame(
        [(datetime(2024, 1, 1, 10 + h, m), et) for h, m, et in specs], SCHEMA
    )


def test_decay_fold_halves_at_half_life():
    from huracan_spark.streaming.trending import decay_fold

    hl = 1_000_000
    last, trend = decay_fold([0], hl)
    assert trend == 1.0
    last, trend = decay_fold([hl], hl, (last, trend))
    # the old mass halved, the new event added 1
    assert trend == pytest.approx(1.5)


def test_trending_stream_converges_to_batch(spark, tmp_path):
    from huracan_spark.streaming.trending import (
        trending_counts_batch,
        trending_counts_stream,
    )

    feed = str(tmp_path / "tfeed")
    ck = str(tmp_path / "tck")
    out = str(tmp_path / "tout")

    batch1 = [(0, 0, "click"), (0, 10, "click"), (0, 20, "view")]
    batch2 = [(0, 40, "click"), (1, 0, "view"), (1, 30, "view")]

    def _sink(bdf, _bid):
        bdf.persist()
        if bdf.count():
            bdf.write.mode("append").parquet(out)
        bdf.unpersist()

    def _run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(feed)
        q = (
            trending_counts_stream(stream, half_life=HALF_LIFE)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _rows(spark, *batch1).coalesce(1).write.mode("append").parquet(feed)
    _run_once()
    _rows(spark, *batch2).coalesce(1).write.mode("append").parquet(feed)
    _run_once()

    # latest emitted row per key == the batch fold over the FULL history
    emitted = spark.read.parquet(out).collect()
    latest = {}
    for r in emitted:
        if r.key not in latest or r.last_event_us > latest[r.key].last_event_us:
            latest[r.key] = r
    want = {
        r.key: r
        for r in trending_counts_batch(
            _rows(spark, *batch1, *batch2), half_life=HALF_LIFE
        ).collect()
    }
    assert set(latest) == set(want)
    for k in want:
        assert latest[k].last_event_us == want[k].last_event_us
        assert latest[k].trend == pytest.approx(want[k].trend, rel=1e-12)
    # sanity: trend favors recency — 3 clicks spread over 100 min decay
    # to less than the raw count
    assert 1.0 < want["click"].trend < 3.0


def test_trending_batch_matches_closed_form(spark):
    from huracan_spark.streaming.trending import trending_counts_batch

    rows = _rows(spark, (0, 0, "view"), (0, 30, "view"), (1, 0, "view"))
    got = trending_counts_batch(rows, half_life=HALF_LIFE).collect()[0]
    # fold: 1 -> 1*0.5+1 = 1.5 -> 1.5*0.5+1 = 1.75  (30-min half life)
    assert got.trend == pytest.approx(1.75)
    assert math.isfinite(got.trend)
