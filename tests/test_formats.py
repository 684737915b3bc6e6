"""Format-edge readers (sources/formats.py): JSONL/CSV feeds normalize
to the documents contract; malformed rows route to the DLQ channel."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from huracan_spark.sources.formats import (
    read_documents_csv,
    read_documents_jsonl,
)
from huracan_spark.sources.tables import load_table


def _fixture_rows(spark, sf_dir, n=50):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "source", "lang", "n_chars", "text")
        .collect()
    )


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    rows = _fixture_rows(spark, sf_dir)
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    got = read_documents_jsonl(spark, str(p))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, rows))


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    rows = _fixture_rows(spark, sf_dir)
    src = spark.createDataFrame(rows)
    p = str(tmp_path / "docs_csv")
    src.coalesce(1).write.option("header", "true").option("escape", '"').csv(p)
    got = read_documents_csv(spark, p)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, rows))


def test_jsonl_dlq_split_and_strict_mode(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    good = {"doc_id": 1, "source": "web", "lang": "en",
            "n_chars": 5, "text": "hello"}
    with open(p, "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write('{"doc_id": "not-a-number", "text": "bad types"}\n')
        f.write("{this is not json at all\n")
    clean, dlq = read_documents_jsonl(spark, str(p), with_dlq=True)
    assert [r.doc_id for r in clean.collect()] == [1]
    # both malformed lines preserved verbatim for replay (K7 pattern)
    bad = sorted(r._corrupt_record for r in dlq.collect())
    assert len(bad) == 2 and bad[1].startswith("{this is not")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_documents_jsonl(spark, str(p), strict=True).collect()


def test_formats_union_by_name_with_parquet(spark, sf_dir, tmp_path):
    """The readers' whole point: one canonical schema across formats."""
    rows = _fixture_rows(spark, sf_dir, n=10)
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    jl = read_documents_jsonl(spark, str(p))
    pq = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
        .select(*jl.columns)
    )
    u = jl.unionByName(pq)
    assert u.count() == 10 + pq.count()
    assert dict(u.dtypes) == dict(jl.dtypes)


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    from huracan_spark.sources.formats import (
        read_documents_orc,
        write_documents_orc,
    )

    rows = _fixture_rows(spark, sf_dir)
    src = spark.createDataFrame(rows)
    p = str(tmp_path / "docs_orc")
    write_documents_orc(src, p)
    got = read_documents_orc(spark, p)
    assert got.columns == ["doc_id", "source", "lang", "n_chars", "text"]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, rows))


def test_orc_read_pins_schema_and_rejects_broken_feed(spark, sf_dir, tmp_path):
    from huracan_spark.sources.formats import read_documents_orc

    rows = _fixture_rows(spark, sf_dir)
    # a feed written with a wider/int type and an extra column must be
    # cast and pruned back to the contract, not adopted
    widened = (
        spark.createDataFrame(rows)
        .withColumn("doc_id", F.col("doc_id").cast("int"))
        .withColumn("extra", F.lit("x"))
    )
    p = str(tmp_path / "docs_orc_wide")
    widened.write.mode("overwrite").orc(p)
    got = read_documents_orc(spark, p)
    assert dict(got.dtypes)["doc_id"] == "bigint"
    assert "extra" not in got.columns
    # a feed missing a contract column is refused loudly
    bad = spark.createDataFrame(rows).drop("text")
    pb = str(tmp_path / "docs_orc_bad")
    bad.write.mode("overwrite").orc(pb)
    with pytest.raises(ValueError, match="missing contract columns"):
        read_documents_orc(spark, pb)


def test_documents_jsonl_round_trip(spark, sf_dir, tmp_path):
    from huracan_spark.sources.formats import (
        read_documents_jsonl,
        write_documents_jsonl,
    )
    from huracan_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out, compression="gzip")
    back = read_documents_jsonl(spark, out, strict=True)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "text", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "text", "n_chars").collect()}
    assert a == b
