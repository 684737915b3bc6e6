"""Custom stateful streaming operator: version-aware object dedup.

The reference's backfill dedup (RocksDB guard, etl.rs:963-975) has a
known FIXME (etl.rs:967-969): it stores only the object id, so a NEWER
version of an already-seen object is wrongly skipped within one run.
This operator is the corrected semantics as a Structured Streaming
stateful transform: per object id, keep suppression floors across
micro-batches and shed only rows that PROVABLY cannot change sink
state — the streaming twin of the K1 MERGE guard (etl.rs:1259-1261),
pushed upstream so dead rows never reach enrichment.

The suppression state is TWO floors per id, because the two change
kinds carry different guarantees:

- ``tomb_floor`` — the highest TOMBSTONE version emitted.  Deletions
  bypass enrichment (P2 short-circuit) and delete is final
  (etl.rs:1238-1247), so a tombstone that was emitted has certainly
  reached the sink: any row at or below it (and any live row AT it —
  the equal-version tie goes to the tombstone) is dead weight.
- ``live_max`` — the highest LIVE version emitted, used ONLY to shed
  an exact re-delivery of that same version (M2 reconciliation).  A
  live version is NOT a suppression floor for lower versions: an
  emitted live row can still fail enrichment downstream (-> DLQ), and
  the sink's K1 guard then needs the best lower version as fallback —
  which may arrive in a LATER micro-batch.  Suppressing it would
  diverge from the batch golden (found by the r5 interleaving
  property test: v3 DLQs in batch 1, the v2 fallback arrives in
  batch 3).  Re-emitted lower versions that already merged are
  no-ops under the idempotent versioned MERGE.

This keeps stream output convergent with the batch golden for ANY
micro-batch split of the change stream, including same-version
delete/live flips and cross-batch DLQ-fallback cascades.

Implementation: ``applyInPandasWithState`` (Arrow-batched, grouped by
object id). State is (int64, bool) per live object id, partitioned by
the grouping key, so it scales horizontally with executors and can be
backed by the RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) at 100 TB — the
direct analog of the reference's RocksDB, managed by Spark instead of
by hand. A processing-time timeout (default 1 h) GCs ids never seen
again, bounding state like the reference's 120-checkpoint map GC
(etl.rs:306).

The same function doubles as a batch operator via
``applyInPandas`` (no state, single pass) so the two drivers share
semantics exactly like the reference's shared pipeline tail.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

__all__ = ["dedup_latest_version_stream", "dedup_latest_version_batch"]

# Arrow/pandas output schema shared by both modes (envelope subset that
# downstream enrichment needs; extend if callers carry more columns).
_OUT_SCHEMA = (
    "cp long, tx_digest string, change_type string, object_id string, "
    "version long, ts_sui long, ts_first_seen long, ingested_via string"
)
_COLS = [
    "cp",
    "tx_digest",
    "change_type",
    "object_id",
    "version",
    "ts_sui",
    "ts_first_seen",
    "ingested_via",
]


def _emit_newer(
    pdfs: Iterable[pd.DataFrame],
    tomb_floor: int = -1,
    live_max: int = -1,
    winner_only: bool = False,
) -> tuple[list[pd.DataFrame], int, int]:
    """Rows surviving the ``(tomb_floor, live_max)`` suppression state;
    returns (chunks, new tomb_floor, new live_max).

    Streaming mode (``winner_only=False``) emits EVERY distinct
    version that survives, not just the batch max: a higher live
    version can still fail enrichment downstream (-> DLQ), and the
    sink's K1 guard then falls back to the best successfully-enriched
    version — shedding the cascade here would lose that fallback.
    Suppression rules (see module docstring for why they differ):

    - any row at or below ``tomb_floor`` is shed (delete is final;
      a live row AT the floor loses the equal-version tie);
    - a live row equal to ``live_max`` is shed (exact re-delivery);
      live rows BELOW ``live_max`` pass — they are the cross-batch
      DLQ-fallback cascade, and re-merging an already-merged version
      is a no-op;
    - within a batch, per version one row is kept, tombstone-preferred
      (deterministic — not arrival order).

    Batch mode (``winner_only=True``) is a pure compaction: one
    max-(version, tombstone) winner per key.

    Every chunk is filtered against the floors captured at BATCH entry
    — never against floors advanced mid-batch.  A micro-batch's rows
    for one key can span several Arrow chunks in arbitrary version
    order; advancing a floor per chunk would silently drop a version
    that is above the state floor but below an earlier chunk's max,
    shedding part of the cascade the sink relies on.  The running
    maxima are tracked separately and become the new state once, after
    all chunks.
    """
    kept = []
    for pdf in pdfs:
        isdel = pdf["change_type"].eq("deleted")
        v = pdf["version"]
        mask = (v > tomb_floor) & (isdel | (v != live_max))
        k = pdf[mask]
        if len(k):
            kept.append(k)
    if not kept:
        return [], tomb_floor, live_max
    allk = pd.concat(kept) if len(kept) > 1 else kept[0]
    allk = allk.assign(_d=allk["change_type"].eq("deleted"))
    # per version keep one row, tombstone-preferred (deterministic —
    # not arrival order)
    allk = allk.sort_values(["version", "_d"], kind="stable").drop_duplicates(
        "version", keep="last"
    )
    if winner_only:
        allk = allk.tail(1)  # max (version, tombstone) after the sort
    d = allk["_d"]
    if d.any():
        tomb_floor = max(tomb_floor, int(allk.loc[d, "version"].max()))
    if (~d).any():
        live_max = max(live_max, int(allk.loc[~d, "version"].max()))
    return [allk[_COLS]], tomb_floor, live_max


def dedup_latest_version_stream(
    changes: DataFrame,
    key_col: str = "object_id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming version-aware dedup (M3 corrected): shed replayed
    tombstone-dominated rows and exact live re-deliveries, per the
    two-floor rule in the module docstring (a live version is never a
    floor for lower versions — they are the cross-batch DLQ-fallback
    cascade).

    ``state_timeout_ms`` enables processing-time state GC (the 120-cp
    analog) for CONTINUOUS streams. Leave it None for availableNow /
    bounded replays: a pending state timeout makes Spark keep running
    empty micro-batches until it fires, so a drain-and-stop query
    would never terminate.
    """

    def _fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tomb_floor, live_max = state.get
        else:
            tomb_floor, live_max = -1, -1
        chunks, tf2, lm2 = _emit_newer(pdfs, tomb_floor, live_max)
        if (tf2, lm2) != (tomb_floor, live_max):
            state.update((tf2, lm2))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield from chunks

    return changes.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType="tomb_floor long, live_max long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def dedup_latest_version_batch(
    changes: DataFrame, key_col: str = "object_id"
) -> DataFrame:
    """Batch twin: same per-id winner selection in one pass."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        chunks, _, _ = _emit_newer([pdf], winner_only=True)
        return chunks[0] if chunks else pdf.iloc[0:0][_COLS]

    return changes.groupBy(key_col).applyInPandas(fn, schema=_OUT_SCHEMA)
