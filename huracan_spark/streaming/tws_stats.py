"""Running per-key stats on Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (used by
``stateful.py``/``trending.py``): named state variables managed by a
``StatefulProcessor`` with an explicit lifecycle — the direction
Structured Streaming is moving for custom state (timers, multiple
state vars, TTL).  This operator keeps a (count, sum, max_event_us)
ValueState per key and emits the refreshed running aggregate for every
key a micro-batch touches — the streaming twin of a groupBy agg whose
history was never retained.

State is one 3-tuple per live key, partitioned by key, RocksDB-backable
— identical scale contract to the other stateful operators.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

__all__ = ["RunningStatsProcessor", "running_stats_stream", "running_stats_batch"]

_OUT_SCHEMA = "key string, n long, total double, max_event_us long"
_STATE_SCHEMA = "n long, total double, max_event_us long"


class RunningStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = (
            tuple(self._stats.get()) if self._stats.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, int(pdf["event_us"].max()))
        self._stats.update((int(n), float(total), int(mx)))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [total], "max_event_us": [mx]}
        )

    def close(self) -> None:
        pass


def _prepare(events: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    from pyspark.sql import functions as F

    return events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("value").cast("double").alias("value"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("event_us"),
    )


def running_stats_stream(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    return (
        _prepare(events, key_col, ts_col)
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_stats_batch(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Batch twin over the full history (the convergence oracle)."""
    from pyspark.sql import functions as F

    return (
        _prepare(events, key_col, ts_col)
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("event_us").alias("max_event_us"),
        )
    )
