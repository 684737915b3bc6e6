"""Dead-letter queue wire format: JSON-lines ObjectItem records.

The reference serializes failed items as JSON onto a Pulsar
``{env}_{net}_objects_retries`` topic (main/src/pulsar.rs:10-20; the
serde derive in macros/src/lib.rs:4-28) and replays them later. Here
the same contract is a JSONL directory (swap for Kafka in production —
the record format is the interface, not the transport):

- ``write_dlq``: append failed change rows as one JSON object per line
- ``read_dlq``: schema-enforced read back to the change schema
- ``replay_dlq``: feed DLQ rows back through the ingest chain — the
  retry consumer. Safe to run repeatedly: the silver MERGE (K1) is
  idempotent, so double replays converge (same stance as the
  reference's at-least-once retry, etl.rs:1245-1247).

JSONL keeps the DLQ greppable for incident debugging — the reason the
reference chose JSON over BSON for the retry topic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.schemas import OBJECT_CHANGE_SCHEMA

__all__ = ["write_dlq", "read_dlq", "replay_dlq"]

_COLS = [f.name for f in OBJECT_CHANGE_SCHEMA.fields]


def write_dlq(changes: DataFrame, path: str) -> None:
    """Append change rows to the DLQ as JSON lines."""
    (
        changes.select(F.to_json(F.struct(*_COLS)).alias("value"))
        .write.mode("append")
        .text(path)
    )


def read_dlq(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced DLQ read; unparseable lines surface as nulls in
    required columns rather than being silently dropped (filter on
    ``object_id IS NULL`` to triage poison messages)."""
    return spark.read.schema(OBJECT_CHANGE_SCHEMA).json(path)


def replay_dlq(
    spark: SparkSession,
    path: str,
    content: DataFrame,
    silver,
    whitelist=None,
    blacklist=None,
) -> int:
    """Retry consumer: run DLQ rows back through parse -> enrich ->
    MERGE. Returns the number of rows replayed. Idempotent by K1."""
    from huracan_spark.pipeline.ingest import (
        build_silver_batch,
        enrich,
        parse_changes,
    )

    items = read_dlq(spark, path).filter(F.col("object_id").isNotNull())
    n = items.count()
    if n:
        res = enrich(parse_changes(items), content, whitelist, blacklist)
        silver.merge(build_silver_batch(res.enriched))
    return n
