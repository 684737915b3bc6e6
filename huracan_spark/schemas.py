"""Canonical schemas for the huracan-spark engine.

Fixed envelope + dynamic payload, per SURVEY §1.2/§1.4: the envelope
is declared as StructType; the Move payload travels as a JSON string
(``fields_json``) queried via JSON-path expressions — MongoDB's
"filter on any nested path" capability without schema lock-in.

u64 caveat: the reference narrows u64 -> i64 for Mongo
(etl.rs:1225, mongo.rs:33-35); Spark's LongType has the same range,
so ``version`` stays LongType and the constraint is documented here
rather than re-discovered.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "OBJECT_CHANGE_SCHEMA",
    "OBJECT_CONTENT_SCHEMA",
    "COMPLETED_CHECKPOINT_SCHEMA",
    "SILVER_SCHEMA",
    "CHANGE_TYPES",
    "KEPT_CHANGE_TYPES",
    "RPC_ERROR_KINDS",
    "INGEST_ROUTES",
]

# main/src/client.rs:178-190: the object-change union. created/mutated
# upsert, deleted tombstones; wrapped/transferred/published dropped
# (reference TODO at client.rs:182-185 — we keep its visible behavior).
CHANGE_TYPES = ("created", "mutated", "deleted", "wrapped", "transferred", "published")
KEPT_CHANGE_TYPES = ("created", "mutated", "deleted")

# main/src/client.rs:118-143 response-error variants (P4 triage).
RPC_ERROR_KINDS = (
    "deleted",
    "not_exists",
    "unknown",
    "display_error",
    "dynamic_field_not_found",
)

# main/src/etl.rs:66-74 ingest routes (P/L/B tags).
INGEST_ROUTES = ("poll", "livescan", "backfill")

# ObjectItem (main/src/etl.rs:53-63) + tx context.
OBJECT_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("cp", T.LongType(), False),
        T.StructField("tx_digest", T.StringType(), False),
        T.StructField("change_type", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("ts_sui", T.LongType(), True),
        T.StructField("ts_first_seen", T.LongType(), False),
        T.StructField("ingested_via", T.StringType(), False),
    ]
)

# multi_get_object response body (etl.rs:1139-1147 options; envelope
# fields per server/src/main.rs:370-446), flattened per FIXTURES.md §2.
OBJECT_CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("object_id", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("owner_kind", T.StringType(), True),
        T.StructField("owner_address", T.StringType(), True),
        T.StructField("initial_shared_version", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("previous_transaction", T.StringType(), True),
        T.StructField("storage_rebate", T.StringType(), True),
        T.StructField("has_public_transfer", T.BooleanType(), True),
        T.StructField("fields_json", T.StringType(), True),
        T.StructField("bcs_b64", T.StringType(), True),
        T.StructField("rpc_error", T.StringType(), True),
    ]
)

# main/src/mongo.rs:10-17
COMPLETED_CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("checkpoint_id", T.LongType(), False),
        T.StructField("stop", T.BooleanType(), True),
    ]
)

# Silver current-state table (the Mongo objects collection analog,
# etl.rs:1222-1268): envelope + flattened content + tombstone flag.
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("version_", T.LongType(), False),
        T.StructField("version_hex", T.StringType(), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("owner_kind", T.StringType(), True),
        T.StructField("owner_address", T.StringType(), True),
        T.StructField("initial_shared_version", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("previous_transaction", T.StringType(), True),
        T.StructField("storage_rebate", T.StringType(), True),
        T.StructField("fields_json", T.StringType(), True),
        T.StructField("bcs_b64", T.StringType(), True),
    ]
)
