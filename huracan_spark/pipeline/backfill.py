"""Backfill driver (S2/S3): batch ingest of a checkpoint range.

spawn_backfill_pipeline (etl.rs:574-672) re-expressed as one batch
job: read the change stream, skip already-completed checkpoints
(anti-join — the Spark form of the stride-scan's completed-range skip,
etl.rs:913-939), honor the ``stop`` marker lower bound
(etl.rs:616-631), run the transform chain, MERGE into silver, record
newly completed checkpoints.

Scan partitioning note (S2): the reference stripes checkpoints over N
workers (partition + k*step, etl.rs:886-1025).  Spark's parquet split
planning does the same job; we additionally repartition the stream by
``cp`` when the caller wants checkpoint-aligned tasks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.pipeline.ingest import (
    EnrichResult,
    build_silver_batch,
    checkpoint_completion,
    enrich,
    parse_changes,
    reconcile_duplicates,
)
from huracan_spark.pipeline.silver import MergeMetrics, SilverTable

__all__ = ["BackfillResult", "run_backfill"]


@dataclass
class BackfillResult:
    silver: SilverTable
    completed_checkpoints: DataFrame
    dlq: DataFrame
    error_counts: DataFrame
    merge_metrics: MergeMetrics | None
    max_cp_completed: int | None
    #: the persisted enrichment join backing dlq/error_counts — callers
    #: done with those DataFrames may unpersist it to release the cache
    cached: DataFrame | None = None


def apply_checkpoint_bounds(
    changes: DataFrame, completed: DataFrame | None
) -> DataFrame:
    """S2 skip + stop-marker chop: drop changes whose cp is already
    completed; drop everything at/below the highest ``stop`` marker
    (the reference chops the backfill there, etl.rs:616-631)."""
    out = changes
    if completed is not None:
        stop_row = (
            completed.filter(F.col("stop") == True)  # noqa: E712
            .agg(F.max("checkpoint_id").alias("stop_cp"))
            .first()
        )
        if stop_row and stop_row.stop_cp is not None:
            out = out.filter(F.col("cp") > stop_row.stop_cp)
        done = completed.select(F.col("checkpoint_id").alias("cp"))
        # completed-cp set is tiny (one row per checkpoint): broadcast
        # anti-join instead of a shuffle
        out = out.join(F.broadcast(done), "cp", "left_anti")
    return out


def run_backfill(
    spark: SparkSession,
    changes: DataFrame,
    content: DataFrame,
    silver: SilverTable,
    completed: DataFrame | None = None,
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
    collect_metrics: bool = False,
) -> BackfillResult:
    bounded = apply_checkpoint_bounds(changes, completed)
    parsed = parse_changes(bounded)
    deduped = reconcile_duplicates(parsed)
    # cache_join: merge / completion accounting / the returned dlq are
    # separate actions over the same enrichment join (r11)
    res: EnrichResult = enrich(
        deduped, content, whitelist, blacklist, cache_join=True
    )
    batch = build_silver_batch(res.enriched)
    metrics = silver.merge(batch, collect_metrics=collect_metrics)
    # accounting from the PRE-triage bounded input: checkpoints whose
    # changes are all triage-dropped must still complete (K6)
    newly_done = checkpoint_completion(bounded, res.dlq)
    max_cp = newly_done.agg(F.max("checkpoint_id")).first()[0]
    return BackfillResult(
        silver=silver,
        completed_checkpoints=newly_done,
        dlq=res.dlq,
        error_counts=res.errors,
        merge_metrics=metrics,
        max_cp_completed=max_cp,
        cached=res.cached,
    )
