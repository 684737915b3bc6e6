"""Spark-4-native source coverage: Python DataSource (paginated RPC as
partition-per-page scan), built-in XML feeds, and the RocksDB state
store provider behind a stateful streaming query."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T


# -- Python DataSource: paginated RPC ----------------------------------------


def test_rpc_datasource_partition_per_page(spark):
    from huracan_spark.sources.rpc_datasource import register_rpc_source

    register_rpc_source(spark)
    df = (
        spark.read.format("paginated_rpc")
        .option("page_size", 50)
        .option("n_pages", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # pages fetch in parallel
    rows = df.collect()
    assert len(rows) == 400
    assert len({r.object_id for r in rows}) == 400  # ids unique across pages
    assert {r.cp for r in rows} == set(range(400))


def test_rpc_datasource_reads_are_replay_stable(spark):
    from huracan_spark.sources.rpc_datasource import register_rpc_source

    register_rpc_source(spark)

    def snap():
        return sorted(
            tuple(r)
            for r in spark.read.format("paginated_rpc")
            .option("page_size", 20)
            .option("n_pages", 3)
            .option("seed", "replay")
            .load()
            .collect()
        )

    assert snap() == snap()


def test_rpc_datasource_composes_with_relational_ops(spark):
    """The custom source is a normal scan: filters/aggregates compose."""
    from huracan_spark.sources.rpc_datasource import register_rpc_source

    register_rpc_source(spark)
    df = (
        spark.read.format("paginated_rpc")
        .option("page_size", 100)
        .option("n_pages", 4)
        .load()
    )
    per_owner = df.groupBy("owner").agg(F.count("*").alias("n")).collect()
    assert sum(r.n for r in per_owner) == 400
    assert all(r.owner.startswith("owner_") for r in per_owner)


# -- XML document feed --------------------------------------------------------


def test_documents_xml_round_trip(spark, sf_dir, tmp_path):
    from huracan_spark.sources.formats import (
        read_documents_xml,
        write_documents_xml,
    )
    from huracan_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_xml")
    write_documents_xml(docs, out)
    back = read_documents_xml(spark, out)
    a = {tuple(r) for r in docs.select("doc_id", "source", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "source", "n_chars").collect()}
    assert a == b


# -- RocksDB state store ------------------------------------------------------


def test_windowed_agg_on_rocksdb_state_store(spark, tmp_path):
    """The watermarked windowed agg must produce identical results with
    the RocksDB state store provider (the off-heap backend the 100 TB
    state-scaling notes rely on)."""
    from huracan_spark.streaming.windows import windowed_event_counts

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    feed = str(tmp_path / "rfeed")
    out = str(tmp_path / "rout")
    rows = [
        (datetime(2024, 1, 1, 10, m), et, v)
        for m, et, v in [(0, "click", 1.0), (4, "click", 2.0), (12, "view", 3.0),
                         (40, "click", 9.0)]
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(feed)

    def _sink(bdf, _bid):
        bdf.persist()
        if bdf.count():
            bdf.write.mode("append").parquet(out)
        bdf.unpersist()

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).parquet(feed)
        q = (
            windowed_event_counts(stream)
            .writeStream.foreachBatch(_sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "rck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = {
        (r.window_start.minute, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # watermark (5 min) passed the first two 10-min windows via the 10:40 row
    assert emitted[(0, "click")] == (2, 3.0)
    assert emitted[(10, "view")] == (1, 3.0)
