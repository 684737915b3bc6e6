"""Batch ingest transform chain: object changes -> silver state.

The reference's channel-based dataflow (main/src/etl.rs §3.1 lifecycle)
re-expressed as pure DataFrame transforms.  Each stage is a function
DataFrame -> DataFrame so the same chain serves the batch/backfill
driver and the Structured Streaming ``foreachBatch`` driver
(SURVEY §7.0: one code path, two drivers, mirroring etl.rs:93-98 vs
etl.rs:102+).

Stage map (SURVEY §2 ids):
  P1 parse/triage      -> ``parse_changes``
  M2/M3 dedup          -> ``reconcile_duplicates``
  P2/P3/P4 + S6 enrich -> ``enrich``
  K1/K2 compaction     -> ``build_silver_batch``
  K7 DLQ               -> ``enrich`` second return value
  K5/K6 completion     -> ``checkpoint_completion``
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huracan_spark.functions.codec import long_to_hex
from huracan_spark.operators.compaction import latest_state
from huracan_spark.schemas import KEPT_CHANGE_TYPES

__all__ = [
    "parse_changes",
    "reconcile_duplicates",
    "enrich",
    "build_silver_batch",
    "checkpoint_completion",
    "EnrichResult",
]


def parse_changes(changes: DataFrame) -> DataFrame:
    """P1 (main/src/client.rs:178-190): keep created/mutated/deleted,
    project a ``deletion`` flag; wrapped/transferred/published dropped
    (the reference's visible behavior; its TODO at client.rs:182-185
    notes Wrapped may deserve handling — we match what it does)."""
    return changes.filter(F.col("change_type").isin(*KEPT_CHANGE_TYPES)).withColumn(
        "deletion", F.col("change_type") == "deleted"
    )


def reconcile_duplicates(changes: DataFrame) -> DataFrame:
    """M2/M3 (etl.rs:274-346, 963-975): collapse cross-route and
    replayed duplicates of the same logical change.  First sighting
    wins (the reference skips the second marker sighting), implemented
    as a min_by aggregate on (ts_first_seen, ingested_via) — one
    key-partitioned shuffle with map-side combine, no window sort.
    """
    key = ["object_id", "version", "change_type"]
    payload = [c for c in changes.columns if c not in key]
    ord_col = F.struct(F.col("ts_first_seen"), F.col("ingested_via"))
    agg = changes.groupBy(*key).agg(
        F.min_by(F.struct(*[F.col(c) for c in payload]), ord_col).alias("_first")
    )
    return agg.select(*key, *[F.col(f"_first.{c}").alias(c) for c in payload])


@dataclass
class EnrichResult:
    enriched: DataFrame  # changes + content columns (deletions carried, payload null)
    dlq: DataFrame  # changes whose content fetch failed (K7)
    errors: DataFrame  # per-error-kind counts (P4 -> metrics K8)
    #: the persisted enrichment join when ``cache_join=True`` — the
    #: caller MUST unpersist it after consuming the result branches
    cached: DataFrame | None = None


def enrich(
    parsed: DataFrame,
    content: DataFrame,
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
    cache_join: bool = False,
) -> EnrichResult:
    """S6 enrichment join + P2 deletion short-circuit + P4 error triage
    + P3 white/blacklist.

    The reference fetches content over RPC in batches of 50
    (etl.rs:1135-1201); with a content table the same step is a join.
    Deletions skip enrichment entirely (etl.rs:1150-1154).  Scale
    note: both sides are hash-partitioned on (object_id, version); no
    broadcast since content is as big as the stream — at 100 TB this
    is the big co-partitioned join, and AQE handles skewed ids.
    """
    deletions = parsed.filter(F.col("deletion"))
    live = parsed.filter(~F.col("deletion"))

    joined = live.join(content, on=["object_id", "version"], how="left")
    cached = None
    if cache_join:
        # .enriched / .dlq / error counts are consumed by SEPARATE
        # sequential actions (merge, DLQ write, checkpoint accounting)
        # — without the pin each one re-runs this corpus-sized
        # co-partitioned join AND the content scan (r11, guide §5).
        # Lazy is safe here: the consumers are sequential actions, not
        # racing broadcast threads (the r7 eager rule's trigger).
        cached = joined = joined.persist()

    # P4: response-error triage -> drop + count per kind (client.rs:118-143)
    errors = (
        joined.filter(F.col("rpc_error").isNotNull())
        .groupBy("rpc_error")
        .agg(F.count("*").alias("n"))
    )
    ok = joined.filter(F.col("rpc_error").isNull())

    # K7: enrichment failure (no content row at all) -> DLQ
    dlq = ok.filter(F.col("object_type").isNull()).select(*parsed.columns)
    ok = ok.filter(F.col("object_type").isNotNull())

    # P3: whitelist/blacklist on the FULL type string incl. generics
    # (utils.rs:29-37 compares exact ObjectType equality per entry)
    if whitelist:
        ok = ok.filter(F.col("object_type").isin(list(whitelist)))
    elif blacklist:
        ok = ok.filter(~F.col("object_type").isin(list(blacklist)))

    # re-attach deletions with null payload columns (tombstone shape)
    content_cols = [c for c in content.columns if c not in ("object_id", "version")]
    deletions_shaped = deletions.select(
        "*", *[F.lit(None).cast(dict(content.dtypes)[c]).alias(c) for c in content_cols]
    )
    enriched = ok.unionByName(deletions_shaped)
    return EnrichResult(enriched=enriched, dlq=dlq, errors=errors, cached=cached)


def build_silver_batch(enriched: DataFrame) -> DataFrame:
    """K1/K2: per object id keep the max-version change; shape into the
    silver envelope (etl.rs:1222-1268).  Tombstones keep null payload
    ("delete is final" — the doc stays, etl.rs:1227-1243).

    The reduce order is ``(version, deletion, ts_first_seen)``: at an
    equal version a tombstone beats a live row — the SAME precedence
    ``merge_into`` applies across batches — so the silver state is
    invariant to how the change stream is split into micro-batches
    (a same-version delete/live flip converges to the tombstone
    whether the two rows share a batch or not)."""
    latest = latest_state(
        enriched, key="object_id", version=("version", "deletion", "ts_first_seen")
    )
    return latest.select(
        F.col("object_id").alias("_id"),
        F.col("version").alias("version_"),
        long_to_hex("version").alias("version_hex"),
        F.col("deletion").alias("deleted"),
        "object_type",
        "owner_kind",
        "owner_address",
        "initial_shared_version",
        "digest",
        "previous_transaction",
        "storage_rebate",
        "fields_json",
        "bcs_b64",
    )


def checkpoint_completion(changes: DataFrame, dlq: DataFrame) -> DataFrame:
    """K5/K6 (etl.rs:518-570, mongo.rs:23-58): a checkpoint is complete
    when every change counted for it has been accounted for — sunk,
    dead-lettered, or dropped by triage/filters.

    ``changes`` must be the PRE-triage input of the run: the reference
    acks every scanned item, including ones its P1 triage drops
    (etl.rs:529-567), so a checkpoint containing only wrapped/
    transferred/published changes still completes.  Counting from the
    post-triage stream would leave such checkpoints forever absent
    from the completed table, and ``apply_checkpoint_bounds`` would
    rescan them on every subsequent backfill.

    In batch mode accounting is per-cp row counts; rows dropped by
    P1/P3/P4 count as accounted (drop + metric, like the reference).
    Only a DLQ'd row — work that still needs a retry — blocks its
    checkpoint.  Returns the completed-checkpoint table (checkpoint_id).
    """
    expected = changes.groupBy("cp").agg(F.count("*").alias("n_expected"))
    dead = dlq.groupBy("cp").agg(F.count("*").alias("n_dead"))
    return (
        expected.join(dead, "cp", "left")
        .withColumn("n_dead", F.coalesce("n_dead", F.lit(0)))
        .filter(F.col("n_dead") == 0)
        .select(F.col("cp").alias("checkpoint_id"))
    )
