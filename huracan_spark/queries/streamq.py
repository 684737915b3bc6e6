"""Driver-visible exercise of REAL Structured Streaming machinery.

Every other streaming surface in the repo is pytest-covered (the
driver's correctness gate compares batch DataFrames); this query puts
an actual ``readStream`` file source -> event-time windowed aggregation
-> ``foreachBatch`` state fold under the DuckDB oracle: the events
fixture is staged to parquet, streamed back in MULTIPLE micro-batches
(``maxFilesPerTrigger``), aggregated in update mode, and the
last-update-wins fold of the emitted changes must equal the plain
batch GROUP BY — exactly the convergence contract the reference's
checkpoint-stream (etl.rs poll loop, SURVEY §2.7) relies on: totals
are independent of how the stream was micro-batched.

Update mode emits a changed group once per micro-batch that touches
it; the LAST emission carries the running total, so folding by key
converges to the batch answer for ANY batch split.  No watermark is
set, so no row can be late-dropped — the query pins exactness (a
production deployment bounds state with ``withWatermark`` and accepts
the documented lateness cutoff instead; see streaming/windows.py).

Scale notes: the foreachBatch fold is EXECUTOR-SIDE (the
``streaming/gold_view.py`` pattern): each micro-batch's changed-group
rows MERGE last-update-wins into a persisted keyed parquet state via
a union + max_by(side) reduce — no driver materialization of
aggregate rows, so the fold stays distributed however large the
|windows x event types| grid grows (years of events x wide type
dimension at 100 TB).  ONE job per trigger: the batch is referenced
exactly once and the refreshed state writes to a sibling dir swapped
in afterwards (r11).  A batch-id marker makes replayed batches
idempotent; the staged copy is one pass over the input and the stream
reads files in parallel per micro-batch.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

_SF_MATERIALIZED: dict[tuple, DataFrame] = {}

_STREAM_TUMBLING_ORACLE = """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_tumbling_totals",
    _STREAM_TUMBLING_ORACLE,
    doc="a REAL availableNow stream (file source, >=2 micro-batches) "
    "through an update-mode tumbling-window aggregation, folded "
    "last-update-wins in foreachBatch — the final state must equal "
    "the declarative batch GROUP BY regardless of micro-batching "
    "(SURVEY §2.7 exactly-once convergence, driven under the oracle)",
)
def q_stream_tumbling_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, "streamtumble")
    cached = _SF_MATERIALIZED.get(key)
    if cached is not None:
        return cached
    from huracan_spark.queries.matcost import close_span, open_span

    _span = open_span("stream:tumbling_staging")

    root = tempfile.mkdtemp(prefix="hs_streamq_")
    staged = os.path.join(root, "in")
    # stage through load_table (events.parquet is TIMESTAMP(NANOS); the
    # loader owns the conversion) as timestamp-micros parquet the
    # streaming file source reads natively; 4 files + 2-per-trigger
    # forces the aggregation through multiple micro-batches
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    ev.repartition(4).write.mode("overwrite").parquet(staged)

    state_dir = os.path.join(root, "state")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # executor-side last-update-wins MERGE of the changed groups
        # into the persisted keyed state (gold_view.py pattern): prior
        # rows whose key this batch re-emitted are replaced; no
        # aggregate row ever reaches the driver.
        #
        # ONE job per trigger (r11, guide §1.4 "jobs not actions"): the
        # merge is a union + max_by(side) — batch_df is referenced
        # exactly ONCE, so the upstream stateful aggregation runs
        # exactly once with no persist needed (the r5 multi-action
        # re-evaluation hazard only exists with >1 reference), and the
        # write targets a sibling dir swapped in afterwards, so the
        # lineage never reads the dir being replaced (the old
        # localCheckpoint-then-overwrite pair cost a second job and a
        # full extra materialization of the state per trigger).
        import json
        import shutil

        marker = os.path.join(root, "_LAST_BATCH")
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = json.load(f)["batch_id"]
        if batch_id <= last:
            return  # replayed batch after restart — already folded
        old = state_dir + ".old"
        if not os.path.isdir(state_dir) and os.path.isdir(old):
            os.rename(old, state_dir)  # crashed mid-swap: recover
        s = batch_df.sparkSession
        keys = ["window_start_ms", "event_type"]
        if os.path.isdir(state_dir):
            prior = s.read.parquet(state_dir)
            merged = (
                prior.withColumn("_side", F.lit(0))
                .unionByName(batch_df.withColumn("_side", F.lit(1)))
                .groupBy(*keys)
                .agg(
                    F.max_by(
                        F.struct("n", "sum_value"), F.col("_side")
                    ).alias("_w")
                )
                .select(
                    *keys,
                    F.col("_w.n").alias("n"),
                    F.col("_w.sum_value").alias("sum_value"),
                )
            )
        else:
            merged = batch_df
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(state_dir):
            os.rename(state_dir, old)
        os.rename(tmp, state_dir)
        shutil.rmtree(old, ignore_errors=True)
        with open(marker + ".tmp", "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(marker + ".tmp", marker)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias(
                "window_start_ms"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .option("checkpointLocation", os.path.join(root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # timed out: state_dir is partially written and would be cached
        # per (app, sf_dir) as a silently-wrong fold — fail loudly
        q.stop()
        raise TimeoutError(
            "stream_tumbling_totals: availableNow run exceeded 300s; "
            "refusing to read partial state"
        )
    out = (
        spark.read.parquet(state_dir)
        .select(
            "window_start_ms",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )
    # first-consumer attribution: staging + the availableNow streaming
    # run happen once per (app, sf) — charge the group, not the query
    close_span(_span)
    _SF_MATERIALIZED[key] = out
    return out
