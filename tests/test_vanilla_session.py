"""Regression test for the round-1 driver failure: the correctness
harness hands our queries an externally built *vanilla* SparkSession
(no huracan_spark.session.get_spark confs), and events.parquet is
TIMESTAMP(NANOS) — load_table must make the read work on ANY session
by setting spark.sql.legacy.parquet.nanosAsLong at runtime.

We simulate the driver's session with spark.newSession() and
explicitly unset/false the nanos conf before calling the query.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _vanilla(spark):
    fresh = spark.newSession()
    # force the documented default (false) so this session behaves like
    # one built without session.py's confs, regardless of inheritance
    fresh.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return fresh


def test_load_events_on_vanilla_session(spark, sf_dir):
    from huracan_spark.sources.tables import load_table

    fresh = _vanilla(spark)
    df = load_table(fresh, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert df.count() > 0
    # the loader must not leave a lasting side effect on a session it
    # doesn't own: the conf we set to "false" above must survive the read
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"


def test_load_events_timezone_independent(spark, sf_dir):
    """ts values must be identical regardless of the caller session's
    timezone — the nanos are naive, and the DuckDB oracle reads them
    naively; a TIMESTAMP_LTZ→ntz cast would shift them on non-UTC
    sessions."""
    from huracan_spark.sources.tables import load_table

    utc = _vanilla(spark)
    utc.conf.set("spark.sql.session.timeZone", "UTC")
    tokyo = _vanilla(spark)
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")

    agg = lambda s: (
        load_table(s, sf_dir, "events")
        .agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    a, b = agg(utc), agg(tokyo)
    assert a["n"] == b["n"] > 0
    assert a["lo"] == b["lo"]
    assert a["hi"] == b["hi"]


def test_events_query_on_vanilla_session(spark, sf_dir):
    """End-to-end: run a registered events-backed query exactly the way
    the driver does — fresh session, straight from queries()."""
    import __spark_entry__ as entry_mod

    fresh = _vanilla(spark)
    q = entry_mod.queries()["count_per_type"]
    rows = q(fresh, sf_dir).orderBy("event_type").collect()
    assert len(rows) > 0
    assert all(r["n"] > 0 for r in rows)


def test_entry_on_vanilla_session(spark):
    import __spark_entry__ as entry_mod

    fresh = _vanilla(spark)
    df = entry_mod.entry(fresh)
    # meaningful check, not just "doesn't throw": the flagship query must
    # produce rows on a vanilla session, same as on our own session
    rows = df.collect()
    assert len(rows) > 0
    ours = entry_mod.entry(spark).collect()
    assert len(rows) == len(ours)
