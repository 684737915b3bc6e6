"""Analytics corpus (SURVEY §2.6 A1-A9): the reference's documented
raw-Mongo workload (example-queries/mongodb/*) as DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.operators.islands import descending_ranges
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "estimated_count",
    "SELECT COUNT(*) AS n FROM events",
    doc="A1: estimatedDocumentCount()",
)
def q_estimated_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).agg(F.count("*").alias("n"))


@register(
    "count_per_type",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    doc="A2: $sortByCount per type (order-insensitive compare; sort client-side)",
)
def q_count_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "distinct_types",
    "SELECT DISTINCT event_type FROM events",
    doc="A3/A5: distinct type list",
)
def q_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select("event_type").distinct()


@register(
    "distinct_types_by_owner",
    "SELECT DISTINCT event_type FROM events WHERE user_id = 3",
    doc="A4: distinct types filtered by owner",
)
def q_distinct_types_by_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id") == 3)
        .select("event_type")
        .distinct()
    )


@register(
    "max_doc_size",
    "SELECT MAX(strlen(text)) AS max_doc_bytes FROM documents",
    doc="A6: $bsonSize max — byte length of the largest serialized payload",
)
def q_max_doc_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(F.max(F.octet_length("text")).alias("max_doc_bytes"))


_ISLANDS_ORACLE = """
WITH ids AS (
  SELECT DISTINCT CAST(floor(value) AS BIGINT) AS _id_
  FROM events WHERE event_type = 'click'
), isl AS (
  SELECT _id_, _id_ - row_number() OVER (ORDER BY _id_) AS island
  FROM ids
)
SELECT MAX(_id_) AS range_end, MIN(_id_) AS range_start
FROM isl GROUP BY island
"""


@register(
    "completed_ranges",
    _ISLANDS_ORACLE,
    doc="A7: gaps-and-islands range compression (utils.rs:6-26, the reference's only unit test)",
)
def q_completed_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.floor("value").cast("long").alias("checkpoint_id"))
    )
    return descending_ranges(ids, "checkpoint_id")


@register(
    "behind_by",
    """
    SELECT (SELECT MAX(event_id) FROM events)
         - (SELECT MAX(event_id) FROM events WHERE event_type <> 'error')
         AS behind_by
    """,
    doc="A9: latest_cp - last_completed_cp lag computation (etl.rs:207-217)",
)
def q_behind_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    latest = ev.agg(F.max("event_id").alias("latest"))
    completed = ev.filter(F.col("event_type") != "error").agg(
        F.max("event_id").alias("completed")
    )
    return latest.crossJoin(completed).select(
        (F.col("latest") - F.col("completed")).alias("behind_by")
    )
