"""Streaming exact document dedup (streaming/doc_dedup.py)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from huracan_spark.streaming.doc_dedup import dedup_documents_stream

_SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def _ts(s):
    return datetime(2026, 1, 1, 12, 0, s, tzinfo=timezone.utc)


def test_stream_dedup_first_copy_wins(spark, tmp_path):
    """Duplicate texts across micro-batches collapse to the first
    arrival; distinct texts all pass; fingerprint ignores case/space
    (same normalization as the batch exact_dedup_groups)."""
    feed = str(tmp_path / "docs")
    b1 = [
        (1, "Hello  World", _ts(1)),
        (2, "unique one", _ts(2)),
        (3, "hello world", _ts(3)),  # dup of 1 after normalization
    ]
    b2 = [
        (4, "HELLO WORLD", _ts(10)),  # dup of 1, next micro-batch
        (5, "unique two", _ts(11)),
    ]
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.mode("append").parquet(feed)

    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    q = (
        dedup_documents_stream(stream)
        .writeStream.format("memory")
        .queryName("doc_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM doc_dedup_out").collect()
    kept = sorted(r.doc_id for r in rows)
    assert kept == [1, 2, 5]


def test_stream_dedup_agrees_with_batch_fingerprints(spark, tmp_path, sf_dir):
    """Streaming the documents fixture through the dedup must keep
    exactly one doc per batch-side fingerprint group."""
    from huracan_spark.queries.dedup import _docs

    d = _docs(spark, sf_dir).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id"))
    )
    feed = str(tmp_path / "docs")
    d.select("doc_id", "text", "ingest_ts").coalesce(2).write.parquet(feed)

    stream = spark.readStream.schema(_SCHEMA).parquet(feed)
    q = (
        dedup_documents_stream(stream)
        .writeStream.format("memory")
        .queryName("doc_dedup_fix")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    from huracan_spark.queries.dedup import q_exact_dedup

    n_kept = spark.sql("SELECT count(*) AS n FROM doc_dedup_fix").collect()[0].n
    assert n_kept == q_exact_dedup(spark, sf_dir).count()
