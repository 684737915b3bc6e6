"""Streaming corpus cleaning: online dedup + quality gates.

The online half of queries/dedup.py::q_corpus_clean, wired the lambda
way (reference analog: the poll/livescan split of `main/src/etl.rs:93-98`
— fresh data flows through the cheap online path, the expensive global
pass runs offline):

- EXACT dedup runs in the stream (`doc_dedup.py`:
  `dropDuplicatesWithinWatermark` on the content fingerprint, state
  bounded by the watermark horizon);
- the language-ID + quality gates are the SAME pure column
  expressions the batch pipeline applies
  (queries/dedup.py::quality_gates — one definition, two runtimes);
- near-dup CLUSTERING (MinHash -> LSH -> connected components) is
  deliberately absent here: it is a global iterative computation and
  belongs to the periodic batch pass over the accumulated survivors.

Sink: ``foreachBatch`` appending parquet.  The batch DataFrame is
persisted before its actions — with a stateful operator upstream,
re-evaluating the batch for a second action would re-execute the
dedup against already-advanced state and hard-crash the worker (see
CLAUDE.md gotcha; regression-tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from huracan_spark.queries.dedup import quality_gates
from huracan_spark.streaming.doc_dedup import (
    DOC_DEDUP_WATERMARK,
    dedup_documents_stream,
)

__all__ = ["corpus_clean_stream", "run_corpus_clean_stream"]


def corpus_clean_stream(
    docs: DataFrame,
    *,
    time_col: str = "ingest_ts",
    horizon: str = DOC_DEDUP_WATERMARK,
) -> DataFrame:
    """First-copy-wins exact dedup + language/quality gates over a
    streaming document feed carrying `text` and `time_col`."""
    return quality_gates(
        dedup_documents_stream(docs, time_col=time_col, horizon=horizon)
    )


def run_corpus_clean_stream(
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    time_col: str = "ingest_ts",
    horizon: str = DOC_DEDUP_WATERMARK,
    batch_counts: list[int] | None = None,
):
    """Run the cleaning stream into a parquet directory via
    foreachBatch; returns the started StreamingQuery (availableNow
    trigger — drains the backlog then stops).

    `batch_counts`, if given, collects the per-micro-batch survivor
    count (the K8-style metrics observation point).
    """
    cleaned = corpus_clean_stream(docs, time_col=time_col, horizon=horizon)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # persist FIRST: two actions below; without it the second
        # re-executes the stateful dedup against advanced state
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(out_path)
            if batch_counts is not None:
                batch_counts.append(batch_df.count())
        finally:
            batch_df.unpersist()

    return (
        cleaned.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
