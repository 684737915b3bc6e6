"""Latest-version compaction + versioned merge — the engine's crown jewel.

Reference semantics (main/src/etl.rs:1227-1267):

- per object id keep the row with the highest version (last-writer-wins
  by version, order-independent, duplicate-tolerant);
- a deletion at the max version leaves a tombstone row
  (``deleted=true``), never a physical delete ("delete is final");
- the whole operation is idempotent: replaying any subset of the
  change stream in any order converges to the same state.

Spark-first design:

- ``latest_state``: one shuffle on the key — ``max_by(struct(payload),
  struct(version...))`` — with map-side partial aggregation, which is
  strictly better at scale than the window/row_number formulation
  (no sort, no full materialization per group).  At 100 TB this is a
  single key-partitioned aggregate; skewed ids are handled by AQE.
- ``merge_into``: MERGE-equivalent for parquet silver tables: union
  the pre-reduced batch with the existing state and re-reduce.  With
  Delta available this becomes a real ``MERGE INTO`` with the
  ``b.version_ > s.version_`` condition; the parquet fallback keeps
  identical semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["latest_state", "latest_state_window", "merge_into"]


def latest_state(
    df: DataFrame,
    key: str | Sequence[str],
    version: str | Sequence[str],
) -> DataFrame:
    """Reduce a change stream to one row per key: the max-version row.

    ``version`` may be multiple columns (lexicographic tie-break, e.g.
    ``("version", "ts_first_seen")``) and MUST be a total order per key
    for determinism — the fixture stream has duplicate versions, so
    callers pass a unique tie-breaker.

    Implemented as ``max_by`` aggregation: partial aggregation on the
    map side means only one candidate row per key per input partition
    crosses the shuffle — at 100 TB that's the difference between
    shuffling the table and shuffling ~|keys| rows.
    """
    keys = [key] if isinstance(key, str) else list(key)
    versions = [version] if isinstance(version, str) else list(version)
    payload = [c for c in df.columns if c not in keys]
    ord_col = F.struct(*[F.col(v) for v in versions])
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ord_col).alias("_latest")
    )
    return agg.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def latest_state_window(
    df: DataFrame,
    key: str | Sequence[str],
    version: str | Sequence[str],
) -> DataFrame:
    """row_number()-based formulation (M3's batch mapping in SURVEY §2.3).

    Kept for parity testing against ``latest_state`` and for cases
    where the caller needs *ranked* versions, not just the max.  The
    aggregate version is the performance path.
    """
    from pyspark.sql.window import Window

    keys = [key] if isinstance(key, str) else list(key)
    versions = [version] if isinstance(version, str) else list(version)
    w = Window.partitionBy(*keys).orderBy(*[F.col(v).desc() for v in versions])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into(
    current: DataFrame,
    batch: DataFrame,
    key: str | Sequence[str],
    version: str | Sequence[str],
    deleted: str | None = "deleted",
) -> DataFrame:
    """Versioned MERGE (K1/K2): combine existing silver state with a new
    batch; per key the highest version wins, regardless of which side
    it came from.  Deletion rows must already carry ``deleted=true``
    with payload columns nulled (K2 tombstone shape) — they win like
    any other version and persist as tombstones.

    Equivalent Delta form::

        MERGE INTO silver s USING batch b ON s._id = b._id
        WHEN MATCHED AND b.version_ > s.version_ THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *

    The union-reduce keeps the exact same order-independence and
    idempotence contract (etl.rs:1245-1247) without requiring Delta.

    EQUAL-VERSION ties are resolved deterministically (the bare version
    column is not a total order when producers re-emit a version):

    - if a ``deleted`` column exists, a tombstone beats a live row at
      the same version — "delete is final" (etl.rs:1238-1247) must hold
      even when the late live row carries the tombstone's version;
    - otherwise the STORED side wins, matching the Delta condition
      ``b.version_ > s.version_`` (strictly greater, so an equal-version
      arrival is a no-op, not an arbitrary overwrite).

    Both rules fold into one ``max_by`` ordering struct
    ``(version..., tombstone-precedence, stored-precedence)``, so the
    in-batch pre-reduce and the cross-side reduce obey the same total
    order and replays converge regardless of batch boundaries.
    """
    versions = [version] if isinstance(version, str) else list(version)
    unioned = current.withColumn("_stored_prec", F.lit(1)).unionByName(
        batch.withColumn("_stored_prec", F.lit(0))
    )
    order = list(versions)
    if deleted is not None and deleted in unioned.columns:
        unioned = unioned.withColumn(
            "_del_prec", F.coalesce(F.col(deleted).cast("int"), F.lit(0))
        )
        order.append("_del_prec")
    order.append("_stored_prec")
    return latest_state(unioned, key, order).drop("_del_prec", "_stored_prec")
