"""Streaming MinHash near-dup dedup (streaming/near_dedup.py)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from huracan_spark.queries.dedup import minhash_band_sigs
from huracan_spark.streaming.near_dedup import run_near_dedup_stream

_SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def _ts(s):
    return datetime(2026, 1, 1, 12, 0, s, tzinfo=timezone.utc)


def test_stream_band_sigs_match_batch_lsh(spark, sf_dir):
    """The per-row signature expression must reproduce the batch
    explode+groupBy signatures bucket-for-bucket — this is what makes
    the online prune consistent with the offline clustering."""
    from huracan_spark.queries.dedup import (
        N_BANDS,
        _band_sig_spark,
        _docs,
        _minhash_sig_exprs_spark,
        _shingles,
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    sigs = _shingles(d).groupBy("doc_id").agg(*_minhash_sig_exprs_spark())
    batch = set()
    for b in range(N_BANDS):
        batch |= {
            (r.doc_id, b, r.sig)
            for r in sigs.select(
                "doc_id", _band_sig_spark(b).alias("sig")
            ).collect()
        }
    stream_expr = {
        (r.doc_id, r.c.band, r.c.sig)
        for r in d.select(
            "doc_id", F.explode(minhash_band_sigs("text")).alias("c")
        ).collect()
        # batch path drops docs with <2 tokens; per-row expr emits
        # nothing for them either (empty array -> no explode rows)
    }
    assert stream_expr == batch


def test_stream_near_dedup_drops_near_dup_keeps_distinct(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "bridge while rain falls softly on the quiet village roofs"
    )
    near = base + " tonight"  # high bigram overlap -> shares >=1 band
    distinct = (
        "completely different subject matter entirely unrelated words "
        "about astronomy telescopes galaxies nebulae spectral analysis"
    )
    tiny = "hi"  # <2 tokens after tokenization -> synthetic bucket
    b1 = [(1, base, _ts(1)), (2, distinct, _ts(2))]
    b2 = [(3, near, _ts(10)), (4, tiny, _ts(11))]

    feed = str(tmp_path / "feed")
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.mode("append").parquet(feed)
    time.sleep(1.1)
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.mode("append").parquet(feed)

    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    q = run_near_dedup_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    kept = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    # doc 3 is a near-dup of doc 1 (loses at least one bucket); the
    # rest survive, including the unshingleable tiny doc
    assert kept == [1, 2, 4]


def test_stream_near_dedup_fixture_invariants(spark, sf_dir, tmp_path):
    """Fixture feed: kept docs own pairwise-disjoint bucket sets, and
    every dropped doc shares at least one bucket with another doc —
    invariants that hold regardless of intra-batch arrival order."""
    from huracan_spark.sources.tables import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            "text",
            F.expr(
                "timestampadd(SECOND, CAST(doc_id AS INT),"
                " TIMESTAMP '2026-01-01 00:00:00')"
            ).alias("ingest_ts"),
        )
        .persist()
    )
    feed = str(tmp_path / "feed")
    for lo, hi in ((0, 150), (150, 300)):
        d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(feed)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = run_near_dedup_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    kept_ids = {
        r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    all_claims = {
        r.doc_id: set()
        for r in d.select("doc_id").collect()
    }
    for r in d.select(
        "doc_id", F.explode(minhash_band_sigs("text")).alias("c")
    ).collect():
        all_claims[r.doc_id].add((r.c.band, r.c.sig))
    d.unpersist()

    bucket_docs: dict[tuple, set] = {}
    for doc, claims in all_claims.items():
        for c in claims:
            bucket_docs.setdefault(c, set()).add(doc)

    kept_shingleable = [i for i in kept_ids if all_claims[i]]
    dropped = [i for i in all_claims if i not in kept_ids]
    assert kept_shingleable, "stream kept nothing shingleable"
    assert dropped, "fixture contains near-dups; stream dropped none"
    # kept docs: no bucket shared between two kept docs
    for c, docs_in in bucket_docs.items():
        assert len(docs_in & set(kept_shingleable)) <= 1, (c, docs_in)
    # dropped docs: each collides with some other doc in >=1 bucket
    for i in dropped:
        assert any(len(bucket_docs[c]) > 1 for c in all_claims[i]), i


def test_stream_near_dedup_restart_keeps_bucket_state(spark, tmp_path):
    """Bucket-ownership state must survive a checkpoint restart: a
    near-dup arriving in a NEW streaming query run (same checkpoint)
    is still dropped against the first run's claims."""
    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "bridge while rain falls softly on the quiet village roofs"
    )
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, base, _ts(1))], _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    stream = spark.readStream.schema(_SCHEMA).parquet(feed)
    q = run_near_dedup_stream(stream, out, ckpt)
    q.awaitTermination(120)
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [1]

    # second run, same checkpoint: near-dup of doc 1 + one new doc
    time.sleep(1.1)
    spark.createDataFrame(
        [(2, base + " again", _ts(10)), (3, "entirely different words about telescopes and galaxies tonight", _ts(11))],
        _SCHEMA,
    ).coalesce(1).write.mode("append").parquet(feed)
    stream2 = spark.readStream.schema(_SCHEMA).parquet(feed)
    q2 = run_near_dedup_stream(stream2, out, ckpt)
    q2.awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 3]  # doc 2's buckets were claimed in run 1
