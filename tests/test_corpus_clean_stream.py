"""Streaming corpus_clean (streaming/corpus_clean.py) converges to its
batch twin on the same fixture feed."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.functions.textfns import fingerprint
from huracan_spark.queries.dedup import quality_gates
from huracan_spark.streaming.corpus_clean import run_corpus_clean_stream

_FEED_SCHEMA = "doc_id long, source string, text string, ingest_ts timestamp"


def _feed_from_fixture(spark, sf_dir, n_docs: int = 200):
    """documents fixture -> ordered feed: ingest_ts strictly increases
    with doc_id, so 'first copy' is deterministically the lowest doc_id
    of each fingerprint group."""
    from huracan_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n_docs)
    return d.select(
        "doc_id",
        "source",
        "text",
        F.expr(
            "timestampadd(SECOND, CAST(doc_id AS INT),"
            " TIMESTAMP '2026-01-01 00:00:00')"
        ).alias("ingest_ts"),
    )


def _batch_golden(feed):
    """Batch twin: keep each fingerprint's earliest arrival, then the
    SAME quality_gates the stream applies."""
    w = Window.partitionBy("fingerprint").orderBy("ingest_ts", "doc_id")
    firsts = (
        feed.withColumn("fingerprint", fingerprint("text"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return quality_gates(firsts)


def test_stream_corpus_clean_converges_to_batch(spark, sf_dir, tmp_path):
    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    feed = _feed_from_fixture(spark, sf_dir).persist()
    # three files with disjoint, increasing doc_id ranges => arrival
    # order matches ingest_ts order across micro-batches
    for lo, hi in ((0, 70), (70, 140), (140, 200)):
        feed.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(feed_dir)
        time.sleep(1.1)  # distinct mtimes => deterministic file order

    stream = (
        spark.readStream.schema(_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    counts: list[int] = []
    q = run_corpus_clean_stream(stream, out_dir, ckpt, batch_counts=counts)
    q.awaitTermination(180)

    got = {
        (r.doc_id, r.predicted_lang, r.quality_score)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.doc_id, r.predicted_lang, r.quality_score)
        for r in _batch_golden(feed).collect()
    }
    feed.unpersist()
    assert got == want
    assert len(got) > 0
    # per-batch metrics observed and account for every surviving row
    assert sum(counts) == len(got)


def test_stream_corpus_clean_drops_dups_and_low_quality(spark, tmp_path):
    """Hand-built feed: a duplicate (later copy dropped), a low-quality
    row (gated), a non-language row (gated), and clean rows (kept)."""
    from datetime import datetime, timezone

    def ts(s):
        return datetime(2026, 1, 1, 12, 0, s, tzinfo=timezone.utc)

    clean = (
        "The quick brown fox jumps over the lazy dog and then walks away "
        "to find some food in the quiet green forest with a very happy "
        "little friend while the sun is still high in the clear blue sky "
        "and the birds are singing their song of the long warm day"
    )
    rows = [
        (1, "web", clean, ts(1)),
        (2, "web", clean.upper(), ts(2)),  # dup of 1 (case-insensitive)
        (3, "web", "!!! ??? ... !!!", ts(3)),  # punctuation soup -> gated
        (4, "web", clean + " indeed it was a good day for all of them", ts(4)),
    ]
    feed_dir = str(tmp_path / "feed")
    spark.createDataFrame(rows, _FEED_SCHEMA).coalesce(1).write.parquet(feed_dir)

    stream = spark.readStream.schema(_FEED_SCHEMA).parquet(feed_dir)
    q = run_corpus_clean_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    kept = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert kept == [1, 4]
