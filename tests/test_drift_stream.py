"""Streaming PSI drift monitor: per-batch PSI converges to the batch
fold on the same rows, and injected drift raises the score."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from huracan_spark.sources.tables import load_table
from huracan_spark.streaming.drift import batch_psi, build_reference, monitor_drift

_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def test_stream_psi_matches_batch_fold(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ref = build_reference(ev)

    feed = str(tmp_path / "feed")
    live = ev.limit(4000)
    live.coalesce(1).write.mode("append").parquet(feed)

    out = str(tmp_path / "metrics")
    q = monitor_drift(
        spark.readStream.schema(_SCHEMA).parquet(feed),
        ref,
        out,
        str(tmp_path / "cp"),
    )
    q.awaitTermination(120)

    got = {
        r.event_type: (r.psi, r.n_rows)
        for r in spark.read.parquet(out).collect()
    }
    # availableNow + single file -> one batch containing exactly `live`
    want = {
        r.event_type: (r.psi, r.n_rows)
        for r in batch_psi(spark.read.parquet(feed), ref).collect()
    }
    assert got == want
    assert sum(n for _, n in got.values()) == live.count()
    # self-similar sample: drift should be small
    assert all(abs(p) < 0.25 for p, _ in got.values())


def test_stream_psi_flags_injected_drift(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ref = build_reference(ev)

    # shift one type's values far right: PSI for that type must spike
    drifted = ev.select(
        "event_type",
        F.when(
            F.col("event_type") == "click", F.col("value") * 10 + 1000.0
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )
    scores = {r.event_type: r.psi for r in batch_psi(drifted, ref).collect()}
    assert scores["click"] > 0.25  # act-level drift
    others = [v for k, v in scores.items() if k != "click"]
    assert all(v < 0.1 for v in others)  # everyone else stays calm


def test_batch_psi_null_on_unknown_category(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ref = build_reference(ev)
    novel = ev.limit(100).withColumn("event_type", F.lit("brand_new_type"))
    rows = batch_psi(novel, ref).collect()
    assert len(rows) == 1 and rows[0].psi is None  # new-category alarm


def test_build_reference_degenerate_windows(spark):
    """Empty training window -> loud ValueError; constant-valued window
    -> unit-width bin, finite PSI (no silent null propagation)."""
    import pytest

    empty = spark.createDataFrame([], _SCHEMA)
    with pytest.raises(ValueError, match="empty"):
        build_reference(empty)

    const = spark.createDataFrame([("click", 5.0)] * 20, _SCHEMA)
    ref = build_reference(const)
    assert ref.v1 > ref.v0  # widened range
    rows = batch_psi(const, ref).collect()
    assert len(rows) == 1
    assert rows[0].psi is not None and abs(rows[0].psi) < 0.01
