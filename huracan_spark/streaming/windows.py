"""Event-time windowed aggregation for streams, with watermark-bounded
late-data handling.

The reference has NO event-time semantics (SURVEY §2.0/§2.7 — lateness
is absorbed by the versioned MERGE instead); this module is the widened
streaming surface the brief asks for: tumbling/sliding windows over an
event-time column, with a watermark that (a) bounds state and (b) drops
data later than the horizon — Spark's mechanism for the same problem
the reference's 120-checkpoint GC solves for its dedup map.

State scales with (#open windows x #group keys), not with input rows,
and is partitioned by group key across executors; with the RocksDB
state store provider it spills off-heap exactly like the reference's
RocksDB dedup DB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_event_counts"]


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling (or sliding, if ``slide`` given) counts+sums
    per (window, key). Events arriving later than the watermark horizon
    behind max event time are dropped and their closed windows never
    reopen — deterministic lateness semantics for at-least-once feeds.

    Run this in APPEND output mode when exact lateness cutoffs matter:
    a window emits exactly once, when the watermark passes its end, and
    beyond-horizon rows are excluded (asserted across restarts in
    tests/test_streaming.py). Update mode trades that precision for
    lower latency — Spark only guarantees state EVICTION at the
    watermark there, so a straggler can still merge into a batch whose
    eviction hasn't run yet.
    """
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Session windows (dynamic-gap sessionization): consecutive events
    of a key closer than ``gap`` merge into one session; the session
    closes — and in append mode emits exactly once — when the watermark
    passes its end. State per OPEN session only, partitioned by key.

    The reference has no session semantics at all (SURVEY §2.7); the
    batch twin of this query is the gaps-and-islands `session_windows`
    entry in queries/relational.py — same definition, two engines.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
