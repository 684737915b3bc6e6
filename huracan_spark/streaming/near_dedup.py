"""Streaming NEAR-duplicate dedup via MinHash-LSH bucket ownership.

streaming/doc_dedup.py drops exact copies; this drops near-dups
online, using the SAME MinHash band signatures as the batch LSH
(queries/dedup.py::minhash_band_sigs — shared constants, bit-identical
buckets), so the stream prunes exactly the pairs the batch pipeline
would later cluster.

Mechanism — bucket ownership:
- each doc claims its N_BANDS (band, sig) buckets; the claims are
  exploded rows, then ``dropDuplicatesWithinWatermark`` on (band, sig)
  keeps only each bucket's FIRST claimant (built-in state: RocksDB on
  a cluster, sharded by bucket hash, bounded by the watermark horizon);
- a doc is kept iff it owns ALL its buckets: any lost bucket means an
  earlier doc collided there (LSH near-dup evidence) — the foreachBatch
  tail reduces surviving claims per doc and keeps count == N_BANDS.
  All claims of a doc ride the same input row, so they land in the
  same micro-batch and the reduction never crosses batches.
- docs too short to shingle (< 2 tokens) get a per-doc unique bucket
  (md5 of doc_id), so they always pass — near-dup semantics are
  undefined for them and the batch pipeline also never pairs them.

Transitivity note: a dropped doc's OTHER buckets stay owned by it, so
a later doc colliding only with the dropped doc is also dropped —
chain behavior, same as the batch connected-components clustering
which also removes whole chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from huracan_spark.queries.dedup import N_BANDS, minhash_band_sigs

__all__ = ["near_dedup_claims", "run_near_dedup_stream", "NEAR_DEDUP_WATERMARK"]

NEAR_DEDUP_WATERMARK = "10 minutes"


def near_dedup_claims(
    docs: DataFrame,
    *,
    time_col: str = "ingest_ts",
    horizon: str = NEAR_DEDUP_WATERMARK,
) -> DataFrame:
    """Exploded bucket claims, deduped to first-claimant-per-bucket.

    Output: input columns + (band, sig, n_claims); a doc survives the
    stream iff all n_claims of its rows survive (reduced in the sink).
    """
    sigs = minhash_band_sigs("text")
    # short docs: one synthetic, per-doc-unique bucket
    fallback = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("band"),
            F.md5(F.concat(F.lit("own:"), F.col("doc_id").cast("string"))).alias(
                "sig"
            ),
        )
    )
    claims = docs.withColumn(
        "_claims", F.when(F.size(sigs) > 0, sigs).otherwise(fallback)
    ).withColumn("n_claims", F.size("_claims"))
    exploded = claims.withColumn("_c", F.explode("_claims")).select(
        *docs.columns,
        "n_claims",
        F.col("_c.band").alias("band"),
        F.col("_c.sig").alias("sig"),
    )
    return exploded.withWatermark(time_col, horizon).dropDuplicatesWithinWatermark(
        ["band", "sig"]
    )


def run_near_dedup_stream(
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    time_col: str = "ingest_ts",
    horizon: str = NEAR_DEDUP_WATERMARK,
):
    """Drain the feed (availableNow) writing surviving docs to parquet:
    a doc is written iff it owns every one of its buckets."""
    owned = near_dedup_claims(docs, time_col=time_col, horizon=horizon)
    doc_cols = [c for c in owned.columns if c not in ("band", "sig", "n_claims")]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()  # two actions; see CLAUDE.md foreachBatch gotcha
        try:
            kept = (
                batch_df.groupBy(*doc_cols, "n_claims")
                .agg(F.count("*").alias("_owned"))
                .filter(F.col("_owned") == F.col("n_claims"))
                .select(*doc_cols)
            )
            kept.write.mode("append").parquet(out_path)
        finally:
            batch_df.unpersist()

    return (
        owned.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
