"""Gold-layer aggregate maintained from the silver CDF STREAM.

The medallion pattern's last hop: a downstream consumer — decoupled
from the ingest process — subscribes to the silver table's change
feed (``sources/silver_cdf_source.py``, preimages on) and folds each
micro-batch into a persisted grouped aggregate.  Unlike
``pipeline/incr_view.py`` (which runs inside the writer and reads
changed buckets for payloads), this consumer needs NOTHING but the
feed: preimage rows carry the old payload for the -old adjustment,
postimage rows the +new — so the view refresh is |groups| + |delta|
rows of pure stream input, and the gold job can run on a different
schedule, cluster, or team than the ingest.

Adjustment algebra per feed row (tombstone payloads carry no live
mass and are filtered):

- ``insert`` / ``update_postimage`` (live)   -> +1 row, +value
- ``update_preimage`` / ``delete_preimage``  -> -1 row, -value
- ``delete`` (tombstone postimage), tombstone->tombstone updates -> 0

Replay safety: foreachBatch can re-deliver a committed batch after a
restart; a batch-id marker makes the fold idempotent (the standard
exactly-once foreachBatch pattern).  The refreshed view is written to
a sibling dir and swapped in (the lineage reads the live dir, so an
in-place overwrite would race it — see CLAUDE.md; the swap replaces
the old localCheckpoint-then-overwrite pair, saving one job and one
full view materialization per trigger).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["run_gold_view", "read_gold_view"]


def run_gold_view(
    spark: SparkSession,
    table_path: str,
    view_dir: str,
    group_col: str,
    value_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    from huracan_spark.sources.silver_cdf_source import (
        register_silver_cdf_source,
    )

    register_silver_cdf_source(spark)
    os.makedirs(view_dir, exist_ok=True)
    feed = (
        spark.readStream.format("silver_cdf")
        .option("path", table_path)
        .option("starting", "earliest")
        .option("preimages", "true")
        .load()
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # ONE job per trigger (r11, guide §1.4): batch_df is referenced
        # exactly once (the adjustment aggregate), so no persist is
        # needed (the r5 multi-action re-evaluation hazard only exists
        # with >1 reference); the refreshed view writes to a sibling
        # dir swapped in afterwards, so the lineage never reads the dir
        # being replaced — the old localCheckpoint-then-overwrite pair
        # cost a second job and a full extra materialization of the
        # view per trigger.
        import shutil

        marker = os.path.join(view_dir, "_LAST_BATCH")
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = json.load(f)["batch_id"]
        if batch_id <= last:
            return  # replayed batch after restart — already folded
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).when(
            F.col("_change_type").isin(
                "update_preimage", "delete_preimage"
            ),
            F.lit(-1),
        )
        adj = (
            batch_df.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
            .withColumn("_sign", sign)
            .filter(F.col("_sign").isNotNull())
            .groupBy(group_col)
            .agg(
                F.sum("_sign").alias("n_rows"),
                F.sum(F.col(value_col) * F.col("_sign")).alias(
                    "sum_value"
                ),
            )
        )
        data_dir = os.path.join(view_dir, "data")
        old = data_dir + ".old"
        if not os.path.isdir(data_dir) and os.path.isdir(old):
            os.rename(old, data_dir)  # crashed mid-swap: recover
        s = batch_df.sparkSession
        merged = (
            s.read.parquet(data_dir).unionByName(adj)
            if os.path.isdir(data_dir)
            else adj
        )
        folded = (
            merged.groupBy(group_col)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sum_value").alias("sum_value"),
            )
            .filter(F.col("n_rows") > 0)
        )
        tmp = data_dir + ".tmp"
        folded.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(data_dir):
            os.rename(data_dir, old)
        os.rename(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        with open(marker + ".tmp", "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(marker + ".tmp", marker)

    writer = (
        feed.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="1 second")
    )
    return writer.start()


def read_gold_view(spark: SparkSession, view_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(view_dir, "data"))
