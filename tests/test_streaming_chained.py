"""Chained stateful streaming operators: watermarked dedup feeding a
windowed aggregation inside ONE streaming query (multiple stateful
operators per query, supported since Spark 3.4 in append mode)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def test_dedup_then_window_in_one_query(spark, tmp_path):
    """At-least-once feed -> dropDuplicatesWithinWatermark -> tumbling
    window count, chained in a single streaming query: duplicates must
    count once, and closed windows must equal the batch twin over the
    deduplicated input."""
    feed = str(tmp_path / "cfeed")
    ck = str(tmp_path / "cck")
    out = str(tmp_path / "cout")

    rows = [
        # (event_id, minute, type, value) — ids 1 and 2 delivered twice
        (1, 1, "click", 1.0),
        (1, 1, "click", 1.0),
        (2, 3, "click", 2.0),
        (3, 7, "view", 3.0),
        (2, 4, "click", 2.0),  # dup, slightly late re-delivery
        (4, 12, "view", 4.0),
        (5, 40, "click", 9.0),  # advances watermark far past first windows
    ]
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 10, m), et, v) for i, m, et, v in rows], SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(feed)

    def _sink(bdf, _bid):
        bdf.persist()
        if bdf.count():
            bdf.write.mode("append").parquet(out)
        bdf.unpersist()

    stream = spark.readStream.schema(SCHEMA).parquet(feed)
    chained = (
        stream.withWatermark("ts", "5 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    q = (
        chained.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start.minute, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # finalized first window [10:00, 10:10): ids 1, 2, 3 once each
    assert got[(0, "click")] == (2, 3.0)
    assert got[(0, "view")] == (1, 3.0)
    # window [10:10,10:20) closed by the 10:40 event advancing the watermark
    assert got[(10, "view")] == (1, 4.0)
    # the 10:40 window is still open -> not emitted in append mode
    assert (40, "click") not in got
