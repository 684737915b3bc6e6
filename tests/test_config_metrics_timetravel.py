"""Config loader, metrics table, latency stats, silver time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from huracan_spark.config import EngineConfig, load_config
from huracan_spark.pipeline.fixtures import FixtureConfig, generate
from huracan_spark.pipeline.metrics import MetricsTable, latency_stats
from huracan_spark.pipeline.silver import SilverTable


def test_config_defaults_match_reference():
    cfg = load_config(env={})
    assert cfg.backfill_threshold == 3  # main/config.yaml:11
    assert cfg.poll_interval_ms == 100  # main/config.yaml:17
    assert cfg.rpc_batch_size == 50  # main/config.yaml:41


def test_config_yaml_plus_env_overlay(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text("backfill_threshold: 7\nwhitelist: ['0x2::coin::Coin']\n")
    cfg = load_config(
        str(p),
        env={
            "HURACAN_SPARK_POLL_INTERVAL_MS": "250",
            "HURACAN_SPARK_BLACKLIST": "0x3::a::A,0x3::b::B",
        },
    )
    assert cfg.backfill_threshold == 7
    assert cfg.poll_interval_ms == 250
    assert cfg.whitelist == ["0x2::coin::Coin"]
    assert cfg.blacklist == ["0x3::a::A", "0x3::b::B"]


def test_config_rejects_unknown_keys(tmp_path):
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(env={"HURACAN_SPARK_BOGUS_KNOB": "1"})


def test_metrics_emit_and_read(spark, tmp_path):
    mt = MetricsTable(spark, str(tmp_path / "metrics"))
    mt.emit("inserted_object", 42, source="B")
    mt.emit("rpc_error", 1, rpc_method="multi_get")
    rows = {r.measurement: r for r in mt.read().collect()}
    assert rows["inserted_object"].value == 42.0
    assert '"source": "B"' in rows["inserted_object"].tags


def test_latency_stats_per_route(spark):
    import time

    now = int(time.time() * 1000)
    rows = [
        ("poll", now - 100, now - 150),
        ("poll", now - 300, now - 350),
        ("backfill", now - 5000, now - 6000),
    ]
    df = spark.createDataFrame(rows, "ingested_via string, ts_first_seen long, ts_sui long")
    out = {r.route: r for r in latency_stats(df).collect()}
    assert out["poll"].n == 2 and out["backfill"].n == 1
    assert out["backfill"].p50_ms >= 5000
    assert out["poll"].p50_ms >= 100


def test_silver_time_travel_and_vacuum(spark, tmp_path):
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    batch1 = spark.createDataFrame([("a", 1, False)], "_id string, version_ long, deleted boolean")
    batch2 = spark.createDataFrame([("a", 2, False)], "_id string, version_ long, deleted boolean")
    silver.merge(batch1)
    gen1 = silver.current_generation()
    import time as _t

    _t.sleep(0.002)  # generation names are ms timestamps
    silver.merge(batch2)
    assert silver.read().first().version_ == 2
    # S7: read the historical generation
    assert silver.read(generation=gen1).first().version_ == 1
    removed = silver.vacuum(keep=1)
    assert gen1 in removed
    assert silver.read().first().version_ == 2  # current untouched
