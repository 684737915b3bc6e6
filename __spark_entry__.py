"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``huracan_spark/``; this module only adapts it
to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the huracan silver
    table — latest-state compaction of the change stream (K1/M3),
    enriched by a broadcast join against the customer dimension (S6).
    """
    from pyspark.sql import functions as F

    from huracan_spark.operators.compaction import latest_state
    from huracan_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    latest = latest_state(events, key="user_id", version=("ts", "event_id"))
    return (
        latest.join(
            F.broadcast(customer), latest.user_id == customer.c_custkey, "left"
        )
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
            "c_name",
            "c_mktsegment",
        )
        .orderBy("user_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from huracan_spark.queries.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query in ``queries()``.

    Queries registered with ``oracle=None`` (non-SQL-expressible ops)
    are omitted -> the driver records the weaker rows-only check.
    """
    from huracan_spark.queries.registry import oracle_queries

    return oracle_queries()
