"""Online distribution-drift monitoring: streaming PSI per micro-batch.

The batch drift metric (``queries/extended.py::psi_value_drift``)
promoted to a monitor: a REFERENCE histogram (fixed equi-width bins
over the training window's value range) is computed once batch-side
and broadcast; each micro-batch's value distribution is binned the
same way and its PSI against the reference is appended to a metrics
sink.  This is how a 100 TB ingest watches itself for upstream schema
or behavior shifts without ever rescanning history:

- reference = |types| x nbins proportions — KBs, broadcast;
- per batch: one pass over the batch rows, a bounded-grid fold,
  one metrics row per (batch, event_type);
- alerting = ``psi > threshold`` on the metrics table (0.1 "warn" /
  0.25 "act" are the conventional industry cutoffs).

``batch_psi`` is the shared fold (same Laplace smoothing as the
oracle-checked batch query) used by BOTH the reference build and the
per-batch monitor — and by the convergence test, which proves the
streamed per-batch PSI of a feed equals the batch PSI of the same
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ReferenceHist", "build_reference", "batch_psi", "monitor_drift"]

NBINS = 10


@dataclass(frozen=True)
class ReferenceHist:
    """Per-type reference proportions + the shared binning bounds."""

    v0: float
    v1: float
    # (event_type, bin) -> smoothed proportion
    props: dict[tuple[str, int], float]
    n_bins: int = NBINS


def _binned(df: DataFrame, v0: float, v1: float) -> DataFrame:
    width = (v1 - v0) / NBINS
    bin_col = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(v0)) / F.lit(width)), F.lit(0)),
        F.lit(NBINS - 1),
    ).cast("long")
    return df.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count("*").alias("n")
    )


def build_reference(train: DataFrame) -> ReferenceHist:
    """One pass over the training window -> broadcastable reference.

    Degenerate training windows fail loudly instead of propagating
    nulls: an empty window has no range to bin, and an all-equal
    window's zero-width range is widened to a unit bin so downstream
    PSI stays finite."""
    b = train.agg(F.min("value").alias("v0"), F.max("value").alias("v1")).first()
    if b.v0 is None or b.v1 is None:
        raise ValueError(
            "drift reference: training window is empty — cannot derive "
            "binning bounds"
        )
    if b.v1 == b.v0:
        # constant-valued window: widen to a unit-width range so the
        # bin width is nonzero (all mass lands in bin 0 either way)
        b = type(b)(v0=b.v0, v1=b.v0 + 1.0)
    grid = _binned(train, b.v0, b.v1).collect()
    totals: dict[str, int] = {}
    for r in grid:
        totals[r.event_type] = totals.get(r.event_type, 0) + r.n
    props = {}
    for et, tot in totals.items():
        counts = {r.bin: r.n for r in grid if r.event_type == et}
        for i in range(NBINS):
            props[(et, i)] = (counts.get(i, 0) + 0.5) / (tot + 0.5 * NBINS)
    return ReferenceHist(v0=b.v0, v1=b.v1, props=props)


def batch_psi(batch: DataFrame, ref: ReferenceHist) -> DataFrame:
    """PSI of ``batch``'s per-type value distribution vs the reference.

    Pure DataFrame fold over the bounded grid: bin the batch with the
    REFERENCE bounds, Laplace-smooth, sum (p-q)·ln(p/q) with q from
    the broadcast reference literals.  Types absent from the reference
    surface with psi = NULL (new-category alarm) rather than a fake
    number."""
    spark = batch.sparkSession
    grid = _binned(batch, ref.v0, ref.v1)
    tot = grid.groupBy("event_type").agg(F.sum("n").alias("tot"))
    bins = spark.range(ref.n_bins).select(F.col("id").alias("bin"))
    dense = (
        tot.crossJoin(F.broadcast(bins))
        .join(grid, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            "tot",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    refdf = spark.createDataFrame(
        [(et, b, q) for (et, b), q in ref.props.items()],
        "event_type string, bin long, q double",
    )
    p = (F.col("n") + 0.5) / (F.col("tot") + 0.5 * ref.n_bins)
    return (
        dense.join(F.broadcast(refdf), ["event_type", "bin"], "left")
        .select(
            "event_type",
            ((p - F.col("q")) * F.log(p / F.col("q"))).alias("term"),
            "n",
        )
        .groupBy("event_type")
        .agg(
            F.round(F.sum("term"), 6).alias("psi"),
            F.sum("n").cast("long").alias("n_rows"),
        )
    )


def monitor_drift(
    stream: DataFrame, ref: ReferenceHist, metrics_path: str, checkpoint: str
):
    """Attach the PSI monitor to a value stream: per micro-batch, one
    metrics row per event_type appended to ``metrics_path``."""

    def _fold(bdf: DataFrame, batch_id: int) -> None:
        bdf.persist()  # two actions below (emptiness probe + write)
        try:
            if bdf.isEmpty():
                return
            out = batch_psi(bdf, ref).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            )
            out.write.mode("append").parquet(metrics_path)
        finally:
            bdf.unpersist()

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
