"""Metrics sink (K8) + latency computation (K9).

The reference emits 12 InfluxDB measurements (main/src/influx.rs:11-304)
fire-and-forget; SURVEY maps them to a metrics table appended per batch
plus a StreamingQueryListener.  Metrics are explicitly approximate
(reference warns-and-drops on failure, influx.rs:48-52) — they never
gate the pipeline.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MetricsTable", "latency_stats", "attach_streaming_listener"]

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("measurement", T.StringType(), False),
        T.StructField("tags", T.StringType(), True),  # JSON
        T.StructField("value", T.DoubleType(), False),
    ]
)


class MetricsTable:
    """Append-only parquet metrics table (the Influx analog)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def emit(self, measurement: str, value: float, **tags) -> None:
        now = int(time.time() * 1000)
        row = [(now, measurement, json.dumps(tags, sort_keys=True) or None, float(value))]
        df = self.spark.createDataFrame(row, METRICS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def emit_merge_metrics(self, metrics, route: str = "B") -> None:
        """K3/K8: inserted/modified/unchanged counts (influx.rs:11-34)."""
        for name, v in metrics.as_dict().items():
            self.emit(f"{name}_object", v, source=route)

    def read(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)


def latency_stats(items: DataFrame, route_col: str = "ingested_via") -> DataFrame:
    """K9 (etl.rs:530-544): per-route extraction latency percentiles.

    latency = completion time - first-seen time; in batch mode
    completion is "now", so this measures end-to-end staleness the way
    the reference's ``extraction_latency`` measurement does (tag
    source P/L/B), summarized as exact p50/p95/max.
    """
    now_ms = F.unix_millis(F.current_timestamp())
    lat = items.select(
        F.col(route_col).alias("route"),
        (now_ms - F.col("ts_first_seen")).alias("latency_ms"),
        (now_ms - F.col("ts_sui")).alias("latency_sui_ms"),
    )
    return lat.groupBy("route").agg(
        F.expr("percentile(latency_ms, 0.5)").alias("p50_ms"),
        F.expr("percentile(latency_ms, 0.95)").alias("p95_ms"),
        F.max("latency_ms").alias("max_ms"),
        F.count("*").alias("n"),
    )


def attach_streaming_listener(spark: SparkSession, table: MetricsTable):
    """Stream progress -> metrics rows (batch duration, input rate)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            try:
                table.emit("stream_batch_duration_ms", p.durationMs.get("triggerExecution", 0), query=str(p.id))
                table.emit("stream_num_input_rows", p.numInputRows, query=str(p.id))
            except Exception:
                pass  # metrics are fire-and-forget (influx.rs:48-52)

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)
    return listener


def observe_pipeline(df: DataFrame, name: str = "pipeline"):
    """Attach free in-flight metrics to a DataFrame via Spark's
    ``observe`` mechanism: row count, error-row count and value sum are
    accumulated DURING the action that consumes ``df`` — no second scan,
    unlike a separate ``df.count()`` (which at 100 TB doubles the read).

    Returns ``(observed_df, observation)``; read ``observation.get``
    after the first action completes.  The reference tails every bulk
    write with separate counting queries (main/src/etl.rs:1296-1318) —
    this is the single-pass Spark analog, feedable into MetricsTable.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return observed, obs
