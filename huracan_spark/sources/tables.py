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
        # PARQUET_TYPE_ILLEGAL.  The conf is runtime-settable, so flip it
        # for the read and restore the caller's prior value — no lasting
        # side effect on sessions the library doesn't own.  Spark 4.1
        # resolves the parquet relation LAZILY: the schema is fixed at the
        # first analysis, not at `spark.read.parquet` — so both the
        # schema probe AND the ts conversion must happen inside the conf
        # window, otherwise the restore races the resolution and ts comes
        # back as TIMESTAMP_NTZ on sessions whose prior value was unset.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            ts_type = dict(df.dtypes).get("ts")  # forces analysis NOW
            if ts_type == "bigint":
                # ts arrives as long nanoseconds; truncate to microseconds
                # — exactly what DuckDB does reading the same parquet, so
                # oracle comparisons line up.
                # integer division: ns values (~1.7e18) overflow double's
                # mantissa, so `/ 1000` would silently round by ~256ns.
                # timestampadd onto a TIMESTAMP_NTZ epoch is
                # timezone-INDEPENDENT: timestamp_micros(..).cast('ntz')
                # would render the instant in spark.sql.session.timeZone,
                # shifting values on non-UTC caller sessions relative to
                # the DuckDB oracle (which reads the nanos as naive).
                df = df.withColumn(
                    "ts",
                    F.expr(
                        "timestampadd(MICROSECOND, ts div 1000,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
            elif ts_type == "timestamp_ntz":
                # engine already decoded the nanos as naive; µs cast only
                df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            elif ts_type == "timestamp":
                # LTZ decode (an instant): a bare ntz cast would render
                # wall-clock in spark.sql.session.timeZone and silently
                # diverge from DuckDB's naive read on non-UTC sessions.
                # Go through epoch µs instead (session-tz-independent by
                # definition) and rebase onto the NTZ epoch — renders the
                # UTC wall clock on every session, matching DuckDB's
                # naive read of the UTC-written file.
                df = df.withColumn(
                    "ts",
                    F.expr(
                        "timestampadd(MICROSECOND, unix_micros(ts),"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
            else:
                raise TypeError(
                    f"events.ts decoded as unexpected type {ts_type!r}; "
                    "expected bigint (nanosAsLong), timestamp_ntz, or "
                    "timestamp"
                )
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries match
    the DuckDB oracle's pre-registered views name-for-name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
