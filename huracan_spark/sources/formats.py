"""Document-feed readers for non-parquet wire formats.

Real corpus drops arrive as JSONL (Common-Crawl-style dumps, API
exports) or CSV at least as often as parquet; these readers normalize
any of them to the ``documents`` table contract so every downstream
operator (dedup, quality, BM25, …) is format-agnostic.  Reference
analog: the JSON-RPC page decoding of `main/src/client.rs:120-155` —
wire format parsed once at the edge into one canonical schema.

Scale rules encoded here:
- the schema is DECLARED, never inferred: schema inference reads the
  whole input twice and silently drifts between drops — at 100 TB it
  is both a perf and a correctness bug.  (``spark.read.json`` without
  a schema is the single most common Spark anti-pattern on big JSONL.)
- malformed rows are not silently dropped: PERMISSIVE mode routes
  them to ``_corrupt_record`` so the pipeline can count/DLQ them
  (the K7 retry-queue pattern), and strict mode (FAILFAST) is one
  flag away when a drop must be all-or-nothing.
- both readers emit the same column set as the parquet table, so
  ``unionByName`` across formats is always legal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "DOCUMENTS_FEED_SCHEMA",
    "read_documents_jsonl",
    "read_documents_csv",
    "read_documents_orc",
    "write_documents_orc",
]

# the documents-table contract (TESTDATA.md) + corrupt-record channel
DOCUMENTS_FEED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
        StructField("text", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)

_CANON_COLS = ["doc_id", "source", "lang", "n_chars", "text"]


def _finish(raw: DataFrame, keep_corrupt: bool) -> DataFrame:
    # The clean branch filters on the DATA contract (doc_id/text NOT
    # NULL), not on _corrupt_record: any plan that prunes down to a
    # corrupt-record-only scan (e.g. clean.count()) is rejected by
    # Spark outright (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    # official cache()-then-query workaround is a non-starter for a
    # corpus-sized read.  A partially-parsed row (good doc_id/text,
    # one bad field) is kept here with that field null AND still
    # surfaces in the DLQ channel for audit — documented overlap.
    ok = raw.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).select(*_CANON_COLS)
    if not keep_corrupt:
        return ok
    # the DLQ projection must also reference a data column: Spark
    # disallows queries whose only referenced column is the internal
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    )
    # caller gets (clean, dlq) — the K7 split at the format edge
    return ok, bad  # type: ignore[return-value]


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    strict: bool = False,
    with_dlq: bool = False,
):
    """Read a JSONL document feed with the declared schema.

    strict=True -> FAILFAST (any malformed line aborts the read);
    with_dlq=True -> returns (clean_df, corrupt_df) instead of one df.
    """
    raw = (
        spark.read.schema(DOCUMENTS_FEED_SCHEMA)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if strict:
        return raw.select(*_CANON_COLS)
    # PERMISSIVE gotcha: _corrupt_record is only materialized if the
    # plan also references a data column — selecting it alone is
    # unsupported; this cache-free two-branch split is the documented
    # pattern (Spark SQL guide, JSON data source options)
    return _finish(raw, with_dlq)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    strict: bool = False,
    with_dlq: bool = False,
    header: bool = True,
):
    """Read a CSV document feed with the declared schema (no inference;
    multiline quoted text supported)."""
    raw = (
        spark.read.schema(DOCUMENTS_FEED_SCHEMA)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    if strict:
        return raw.select(*_CANON_COLS)
    return _finish(raw, with_dlq)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC document feed (the other columnar interchange format
    big pipelines standardize on — Hive/Trino-side drops arrive as ORC
    as often as parquet).

    ORC is self-describing, so unlike JSONL/CSV there is no corrupt-
    record channel: a damaged stripe fails the read (the K7 split
    happens upstream at the row-format edge).  The declared-schema rule
    still applies — the read is schema-PINNED, not schema-adopted:
    columns are selected and cast to the documents contract so a feed
    written with wider types (e.g. INT doc_id from a Hive writer)
    cannot silently change downstream dtypes, and contract-violating
    extra columns are pruned at the scan (ORC column projection).
    """
    raw = spark.read.orc(path)
    missing = [c for c in _CANON_COLS if c not in raw.columns]
    if missing:
        raise ValueError(f"ORC feed at {path} missing contract columns {missing}")
    casts = {
        "doc_id": "long",
        "source": "string",
        "lang": "string",
        "n_chars": "long",
        "text": "string",
    }
    return raw.select(*[F.col(c).cast(t).alias(c) for c, t in casts.items()])


def write_documents_orc(df: DataFrame, path: str, *, compression: str = "zstd") -> None:
    """Write a documents-contract DataFrame as ORC (zstd by default —
    the ratio/speed sweet spot for text corpora on both ORC and
    parquet writers)."""
    df.select(*_CANON_COLS).write.mode("overwrite").option(
        "compression", compression
    ).orc(path)


# -- raw media ingestion (binaryFile source) ---------------------------------

# Maps a directory of raw media files onto the MEDIA_SCHEMA contract
# (multimodal.py) via Spark's binaryFile source: payloads stay opaque
# binary columns (never decoded JVM-side), metadata rides typed
# columns.  kind is derived from the file extension; media_id is the
# content-stable hash60 of the relative path, so re-ingesting the same
# drop yields identical ids (idempotent replay, K4 analog at the
# format edge).
#
# Scale notes: binaryFile parallelizes by file; spark.sql.files.
# maxPartitionBytes governs packing of small files into tasks, and
# the pathGlobFilter prunes non-media files at listing time (no read).

_MEDIA_EXT_TO_KIND = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "wav": "audio",
    "mp3": "audio",
    "mp4": "video",
    "mkv": "video",
}


def read_media_binary(spark: SparkSession, path: str) -> DataFrame:
    """Read raw media files under ``path`` into the media-table layout:
    (media_id, kind, payload, source, n_bytes, mtime)."""
    from huracan_spark.functions.textfns import hash60

    glob = "*.{" + ",".join(sorted(_MEDIA_EXT_TO_KIND)) + "}"
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.lit(None).cast("string")
    for e, k in sorted(_MEDIA_EXT_TO_KIND.items()):
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    return raw.select(
        hash60(fname, "media").alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        F.lit(path).alias("source"),
        F.col("length").cast("int").alias("n_bytes"),
        F.col("modificationTime").alias("mtime"),
    )


def write_documents_jsonl(df: DataFrame, path: str, *, compression: str | None = None) -> None:
    """Write a documents-contract DataFrame as JSONL (the interchange
    format most corpus tooling consumes).  Columns are reordered to the
    canonical contract so drops are byte-comparable across writers."""
    out = df.select(*_CANON_COLS)
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


# -- XML document feeds (built-in XML source, Spark 4) -----------------------

def read_documents_xml(spark: SparkSession, path: str, *, row_tag: str = "doc") -> DataFrame:
    """Read an XML document feed into the documents contract.  Schema is
    DECLARED (no two-pass inference), matching the JSONL/CSV readers."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("lang", StringType()),
            StructField("n_chars", LongType()),
            StructField("text", StringType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
        .select(*_CANON_COLS)
    )


def write_documents_xml(df: DataFrame, path: str, *, row_tag: str = "doc") -> None:
    out = df.select(*_CANON_COLS)
    out.write.mode("overwrite").format("xml").option("rowTag", row_tag).option(
        "rootTag", "docs"
    ).save(path)
