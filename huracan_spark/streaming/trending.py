"""Custom stateful streaming operator: event-time exponential-decay
counters ("trending keys").

A plain windowed count forgets everything at the window edge; an
exponential decay keeps one number per key that continuously favors
recent activity — the classic trending/leaderboard signal.  Per key:

    count(t2) = count(t1) * 0.5^((t2 - t1) / half_life) + 1 per event

applied in EVENT-TIME order inside each group, so the result is a pure
function of the event sequence (replay/retry produce identical state,
unlike processing-time decay).

Implementation: ``applyInPandasWithState`` grouped by key — state is
(last_event_us, decayed_count), two scalars per live key, partitioned
by key across executors and RocksDB-backable at scale, like
``stateful.py``.  Each micro-batch sorts ITS OWN rows per key (Arrow
batch-local, bounded by batch size) and folds the decay; cross-batch
ordering is the stream's responsibility (use a watermark + sorted
feeds, or accept the standard at-least-once reordering smear).

``trending_counts_batch`` is the batch twin (one pass over history) —
the convergence oracle used by tests/test_trending_stream.py.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["trending_counts_stream", "trending_counts_batch", "decay_fold"]

_OUT_SCHEMA = "key string, last_event_us long, trend double"
_STATE_SCHEMA = "last_event_us long, trend double"


def decay_fold(
    times_us: Iterable[int],
    half_life_us: int,
    start: tuple[int, float] | None = None,
) -> tuple[int, float]:
    """Fold events (ascending event-time) into (last_us, trend)."""
    last_us, trend = start if start is not None else (None, 0.0)
    for t in times_us:
        if last_us is not None:
            trend *= math.pow(0.5, (t - last_us) / half_life_us)
        trend += 1.0
        last_us = t
    return last_us, trend


def _make_fn(half_life_us: int):
    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - GC path
            state.remove()
            return
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(v) for v in pdf["event_us"])
        times.sort()  # batch-local event-time order (bounded by batch)
        prev = tuple(state.get) if state.exists else None
        last_us, trend = decay_fold(times, half_life_us, prev)
        state.update((int(last_us), float(trend)))
        yield pd.DataFrame(
            {"key": [key[0]], "last_event_us": [int(last_us)], "trend": [trend]}
        )

    return _fn


def trending_counts_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life: str = "30 minutes",
) -> DataFrame:
    """Streaming decayed counters per key; emits the refreshed (key,
    last_event_us, trend) row for every key touched by a micro-batch."""
    from pyspark.sql import functions as F

    half_life_us = _parse_half_life_us(half_life)
    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("event_us"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _make_fn(half_life_us),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        # ProcessingTimeTimeout livelocks under availableNow (CLAUDE.md
        # gotcha) — GC is continuous-mode-only, mirroring stateful.py
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def trending_counts_batch(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life: str = "30 minutes",
) -> DataFrame:
    """Batch twin: one pass over the full history per key."""
    from pyspark.sql import functions as F

    half_life_us = _parse_half_life_us(half_life)
    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("event_us"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        last_us, trend = decay_fold(sorted(int(v) for v in pdf["event_us"]), half_life_us)
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "last_event_us": [last_us], "trend": [trend]}
        )

    return prepared.groupBy("key").applyInPandas(fn, schema=_OUT_SCHEMA)


def _parse_half_life_us(half_life: str) -> int:
    n, unit = half_life.split()
    mult = {
        "seconds": 1_000_000,
        "second": 1_000_000,
        "minutes": 60_000_000,
        "minute": 60_000_000,
        "hours": 3_600_000_000,
        "hour": 3_600_000_000,
    }[unit]
    return int(n) * mult
