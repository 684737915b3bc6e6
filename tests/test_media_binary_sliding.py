"""binaryFile media ingestion, streaming sliding windows, and the
per-batch dimension-refresh (SCD) enrichment pattern."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


# -- binaryFile media source -------------------------------------------------


def test_read_media_binary_maps_files_to_media_schema(spark, tmp_path):
    from huracan_spark.sources.formats import read_media_binary

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8jpegdata")
    (d / "b.wav").write_bytes(b"RIFFwavdata")
    (d / "c.mp4").write_bytes(b"\x00\x00mp4data")
    (d / "notes.txt").write_text("not media")  # pruned at listing time

    rows = {r.kind: r for r in read_media_binary(spark, str(d)).collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert bytes(rows["image"].payload) == b"\xff\xd8jpegdata"
    assert rows["audio"].n_bytes == len(b"RIFFwavdata")
    assert all(r.source == str(d) for r in rows.values())


def test_read_media_binary_ids_are_content_stable(spark, tmp_path):
    """Re-ingesting the same drop yields identical media_ids
    (idempotent replay at the format edge)."""
    from huracan_spark.sources.formats import read_media_binary

    d = tmp_path / "drop2"
    d.mkdir()
    (d / "x.png").write_bytes(b"png1")
    (d / "y.mp3").write_bytes(b"mp31")
    first = {r.media_id for r in read_media_binary(spark, str(d)).collect()}
    second = {r.media_id for r in read_media_binary(spark, str(d)).collect()}
    assert first == second
    assert len(first) == 2


# -- streaming sliding windows -----------------------------------------------


def test_sliding_window_stream_matches_batch_twin(spark, tmp_path):
    """windowed_event_counts(slide=...) over a file feed converges to
    the identical batch sliding-window aggregation (each event in
    window/slide = 2 windows)."""
    from huracan_spark.streaming.windows import windowed_event_counts

    feed = str(tmp_path / "sfeed")
    ck = str(tmp_path / "sck")
    out = str(tmp_path / "sout")
    rows = [
        (datetime(2024, 1, 1, 10, m, s), et, v)
        for m, s, et, v in [
            (0, 30, "click", 1.0),
            (4, 0, "click", 2.0),
            (7, 15, "view", 3.0),
            (12, 0, "click", 4.0),
            (19, 45, "view", 5.0),
        ]
    ]
    batch_df = spark.createDataFrame(rows, EVENT_SCHEMA)
    batch_df.coalesce(1).write.mode("append").parquet(feed)

    def _sink(bdf, _bid):
        # complete mode: every batch carries the full result
        bdf.persist()
        if bdf.count():
            bdf.write.mode("overwrite").parquet(out)
        bdf.unpersist()

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(feed)
    q = (
        windowed_event_counts(stream, window="10 minutes", slide="5 minutes")
        .writeStream.foreachBatch(_sink)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in (
            batch_df.groupBy(
                F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
            .select(
                F.col("win.start").alias("window_start"), "event_type", "n", "sum_value"
            )
            .collect()
        )
    }
    assert got == want
    # each event contributes to exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)


# -- per-batch dimension refresh (SCD enrichment) ----------------------------


def test_foreachbatch_rereads_refreshed_dimension(spark, tmp_path):
    """The streaming enrichment join must see dimension UPDATES between
    micro-batches when the dim is re-read inside foreachBatch — the
    slowly-changing-dimension refresh pattern (a static-joined dim is
    resolved once at plan time and would go stale)."""
    feed = str(tmp_path / "ffeed")
    ck = str(tmp_path / "fck")
    out = str(tmp_path / "fout")
    dim = str(tmp_path / "dim")

    dim_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
    spark.createDataFrame(
        [("click", "v1-click"), ("view", "v1-view")], dim_schema
    ).coalesce(1).write.mode("overwrite").parquet(dim)

    def _sink(bdf, _bid):
        bdf.persist()
        if bdf.count():
            d = spark.read.parquet(dim)  # re-read: picks up refreshes
            bdf.join(F.broadcast(d), "event_type").write.mode("append").parquet(out)
        bdf.unpersist()

    def _run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(feed)
        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 0), "click", 1.0)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(feed)
    _run_once()

    # dimension refresh between batches
    spark.createDataFrame(
        [("click", "v2-click"), ("view", "v2-view")], dim_schema
    ).coalesce(1).write.mode("overwrite").parquet(dim)

    spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 5), "click", 2.0)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(feed)
    _run_once()

    labels = {r.value: r.label for r in spark.read.parquet(out).collect()}
    assert labels == {1.0: "v1-click", 2.0: "v2-click"}
