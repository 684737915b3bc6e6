"""Streaming exact dedup for a document feed.

The streaming twin of queries/dedup.py::exact_dedup_groups: an
arriving document stream is deduplicated on the normalized content
fingerprint so only the FIRST copy of each text ever reaches the sink
— the online half of a training-data ingest (the batch near-dup
pipeline then runs over the survivors).

Spark-shaped for scale:
- fingerprinting is a pure column expression (functions/textfns.py),
  no UDF, computed map-side before any state;
- ``dropDuplicatesWithinWatermark`` keys state by fingerprint only;
  the watermark bounds state size to the horizon — duplicates farther
  apart than the horizon are the batch pipeline's job (standard
  lambda split), so state never grows with corpus size;
- state lives in the state store (RocksDB on a real cluster),
  partitioned by fingerprint hash — adding executors shards it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from huracan_spark.functions.textfns import fingerprint

__all__ = ["dedup_documents_stream", "DOC_DEDUP_WATERMARK"]

DOC_DEDUP_WATERMARK = "10 minutes"


def dedup_documents_stream(
    docs: DataFrame,
    *,
    time_col: str = "ingest_ts",
    horizon: str = DOC_DEDUP_WATERMARK,
) -> DataFrame:
    """First-copy-wins exact dedup on a streaming document feed.

    `docs` must carry `text` and an event-time column `time_col`.
    Emits the input columns plus the `fingerprint` used for dedup.
    """
    return (
        docs.withColumn("fingerprint", fingerprint("text"))
        .withWatermark(time_col, horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
