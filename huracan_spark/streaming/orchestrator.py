"""Driver-side orchestration signals (A9 behind-by, M7 backfill switch).

The reference's control loop (etl.rs:145-391) polls Mongo for the last
completed checkpoint, compares with the chain head, and flips between
livescan and backfill at ``backfillthreshold`` (3), pausing the poll
while backfill catches up (etl.rs:213-252, 1052-1059).  SURVEY §4.1
keeps this as driver-side logic around Spark jobs — it is orchestration,
not a relational operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["IngestMode", "decide_mode", "behind_by"]

BACKFILL_THRESHOLD = 3  # main/config.yaml:11


@dataclass(frozen=True)
class IngestMode:
    mode: str  # "livescan" | "backfill"
    behind: int
    pause_poll: bool


def behind_by(latest_cp: int, completed: DataFrame | None) -> int:
    """A9: latest_cp - max(completed checkpoint); full lag when no
    completion history exists."""
    if completed is None:
        return latest_cp
    row = completed.agg(F.max("checkpoint_id").alias("m")).first()
    last = row.m if row and row.m is not None else 0
    return max(latest_cp - last, 0)


def decide_mode(latest_cp: int, completed: DataFrame | None,
                threshold: int = BACKFILL_THRESHOLD) -> IngestMode:
    """M7/A9: backfill iff more than ``threshold`` checkpoints behind;
    backfill pauses the poll route (etl.rs:1052-1059)."""
    lag = behind_by(latest_cp, completed)
    if lag > threshold:
        return IngestMode(mode="backfill", behind=lag, pause_poll=True)
    return IngestMode(mode="livescan", behind=lag, pause_poll=False)
