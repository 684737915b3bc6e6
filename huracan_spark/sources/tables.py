"""Parquet table loaders for the driver-generated TESTDATA star schema.

Replaces the reference's MongoDB collections + RPC fixtures with
parquet scans (SURVEY.md §2.1 S5: the paginated RPC scan becomes
`spark.read.parquet`).  Scans are declared lazily so Catalyst pushes
filters/column pruning into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "default_sf_dir", "load_table", "load_all", "register_views"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS); a session that was
        # not built by session.py::get_spark (e.g. an externally owned
        # vanilla SparkSession) would fail the read with
        # PARQUET_TYPE_ILLEGAL.  The conf is runtime-settable, so set it
        # here — the loader must work on ANY session, not just ours.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts arrives as long nanoseconds (see session.py nanosAsLong);
        # truncate to microseconds — exactly what DuckDB does when it
        # reads the same parquet, so oracle comparisons line up.
        # integer division: ns values (~1.7e18) overflow double's mantissa,
        # so `/ 1000` would silently round by up to ~256ns
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries match
    the DuckDB oracle's pre-registered views name-for-name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
