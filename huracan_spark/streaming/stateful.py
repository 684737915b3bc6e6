"""Custom stateful streaming operator: version-aware object dedup.

The reference's backfill dedup (RocksDB guard, etl.rs:963-975) has a
known FIXME (etl.rs:967-969): it stores only the object id, so a NEWER
version of an already-seen object is wrongly skipped within one run.
This operator is the corrected semantics as a Structured Streaming
stateful transform: per object id, keep the highest (version,
tombstone) mark seen so far across micro-batches and emit a row only
when it advances that mark — the streaming twin of the K1 MERGE guard
(etl.rs:1259-1261), pushed upstream so stale rows never reach the sink.

The mark is (version, deleted) ordered lexicographically, matching the
equal-version precedence of ``operators/compaction.py::merge_into`` and
``pipeline/ingest.py::build_silver_batch``: a tombstone carrying an
already-seen version still passes (it flips state — "delete is final",
etl.rs:1238-1247), while a live row at the mark's version is shed.
This keeps stream output convergent with the batch golden for ANY
micro-batch split of the change stream, including same-version
delete/live flips.

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
    floor_version: int | None,
    floor_deleted: bool = False,
    winner_only: bool = False,
) -> tuple[list[pd.DataFrame], int | None, bool]:
    """Rows beating the ``(floor_version, floor_deleted)`` mark;
    returns (chunks, new floor version, new floor deleted).

    Streaming mode (``winner_only=False``) emits EVERY distinct version
    above the floor, not just the batch max: a higher version can still
    fail enrichment downstream (-> DLQ), and the sink's K1 guard then
    falls back to the best successfully-enriched version — shedding the
    cascade here would lose that fallback. The floor only protects
    against REPLAYED versions (at-least-once delivery), mirroring the
    reference's RocksDB guard with the version fix (etl.rs:967-969).
    A tombstone AT the floor version still passes when the floor is not
    already tombstoned (equal-version delete/live flip — the tombstone
    must win regardless of which micro-batch carries it); within a
    batch, the per-version dedup prefers the tombstone for the same
    reason, instead of keeping an arbitrary arrival.

    Batch mode (``winner_only=True``) is a pure compaction: one
    max-(version, tombstone) winner per key.

    Every chunk is filtered against the floor captured at BATCH entry
    — never against a floor advanced mid-batch.  A micro-batch's rows
    for one key can span several Arrow chunks in arbitrary version
    order; advancing the floor per chunk would silently drop a version
    that is above the state floor but below an earlier chunk's max,
    shedding part of the cascade the sink relies on.  The running max
    is tracked separately and becomes the new state once, after all
    chunks.
    """
    floor = -1 if floor_version is None else floor_version
    fdel = bool(floor_deleted)
    kept = []
    for pdf in pdfs:
        isdel = pdf["change_type"].eq("deleted")
        mask = (pdf["version"] > floor) | (
            (pdf["version"] == floor) & isdel & (not fdel)
        )
        k = pdf[mask]
        if len(k):
            kept.append(k)
    if not kept:
        return [], floor_version, fdel
    allk = pd.concat(kept) if len(kept) > 1 else kept[0]
    allk = allk.assign(_d=allk["change_type"].eq("deleted"))
    # per version keep one row, tombstone-preferred (deterministic —
    # not arrival order)
    allk = allk.sort_values(["version", "_d"], kind="stable").drop_duplicates(
        "version", keep="last"
    )
    if winner_only:
        allk = allk.tail(1)  # max (version, tombstone) after the sort
    high = int(allk["version"].max())
    high_del = bool(allk.loc[allk["version"] == high, "_d"].iloc[-1])
    if high == floor:
        high_del = high_del or fdel
    return [allk[_COLS]], high, high_del


def dedup_latest_version_stream(
    changes: DataFrame,
    key_col: str = "object_id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming version-aware dedup (M3 corrected): emit a change only
    when it advances the per-id (version, tombstone) high-water mark.

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
            floor_version, floor_deleted = state.get
        else:
            floor_version, floor_deleted = None, False
        chunks, high, high_del = _emit_newer(pdfs, floor_version, floor_deleted)
        advanced = high is not None and (
            floor_version is None
            or high > floor_version
            or (high == floor_version and high_del and not floor_deleted)
        )
        if advanced:
            state.update((high, high_del))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield from chunks

    return changes.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType="high_version long, high_deleted boolean",
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
        chunks, _, _ = _emit_newer([pdf], None, winner_only=True)
        return chunks[0] if chunks else pdf.iloc[0:0][_COLS]

    return changes.groupBy(key_col).applyInPandas(fn, schema=_OUT_SCHEMA)
