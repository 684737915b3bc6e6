"""Incremental view maintenance over the silver table's change feed.

A downstream aggregate (per-group COUNT / SUM over the silver current
state) stays correct WITHOUT rescanning the table: each merge's change
feed (``SilverTable.diff`` — cost proportional to the delta, not the
table) is folded into the materialized view as +new/-old adjustments.
This is the lakehouse "materialized view maintained from CDF" pattern
(the reference recomputes its stats queries from scratch each call —
SURVEY §2.6); at 100 TB the full-state rollup is a one-time backfill
and every subsequent refresh touches only changed buckets.

Delta semantics per change row:
- insert:  +new payload
- update:  -old payload, +new payload
- delete:  -old payload (tombstones carry no live payload)
- drop:    impossible by K2 (delete-is-final keeps keys forever);
           surfaced by ``diff`` and refused here so corruption can't
           fold silently.

The view is itself a tiny grouped table — refresh is a join-free
union + re-aggregate over |groups| + |delta| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huracan_spark.pipeline.silver import SilverTable

__all__ = ["grouped_view", "refresh_view"]


def grouped_view(state: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Full recompute of the aggregate view (the backfill path, and the
    convergence oracle for the incremental path).  Tombstones carry no
    live payload and are excluded."""
    return (
        state.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
        )
    )


def refresh_view(
    view: DataFrame,
    silver: SilverTable,
    gen_old: str,
    gen_new: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Fold the gen_old -> gen_new change feed into ``view``.

    Reads ONLY the changed buckets (via ``SilverTable.diff`` keys
    joined back to the new/old generation bucket reads for payloads),
    emits per-group adjustment rows (+new, -old), unions them with the
    current view and re-aggregates — |groups| + |delta| rows total,
    never a table scan.  Groups whose count drops to zero are removed.
    """
    cdf = silver.diff(gen_old, gen_new)
    if cdf is None:
        return view
    bad = cdf.filter(F.col("change_type") == "drop")
    if bad.limit(1).count():
        raise ValueError(
            "change feed contains 'drop' rows — silver state lost keys, "
            "refusing to fold a corrupt delta into the view"
        )
    cols = ["_id", group_col, value_col, "deleted"]
    changed = silver.changed_buckets(gen_old, gen_new)
    # _bucket_state reconciles merge-on-read deltas and maps physical
    # column names back to logical (column-mapping tables)
    new_df = silver._bucket_state(gen_new, changed)
    old_df = silver._bucket_state(gen_old, changed)
    if new_df is None and old_df is None:
        return view
    new_state = (
        new_df.select(*cols)
        if new_df is not None
        else old_df.select(*cols).limit(0)
    )
    old_state = (
        old_df.select(*cols)
        if old_df is not None
        else new_state.limit(0)
    )

    keys = cdf.select("_id", "change_type")
    live = ~F.coalesce(F.col("deleted"), F.lit(False))
    plus = (
        new_state.join(keys, "_id")
        .filter(F.col("change_type").isin("insert", "update", "delete") & live)
        .select(
            group_col,
            F.lit(1).cast("long").alias("d_rows"),
            F.col(value_col).alias("d_value"),
        )
    )
    minus = (
        old_state.join(keys, "_id")
        .filter(F.col("change_type").isin("update", "delete") & live)
        .select(
            group_col,
            F.lit(-1).cast("long").alias("d_rows"),
            (-F.col(value_col)).alias("d_value"),
        )
    )
    adj = plus.unionByName(minus)
    folded = (
        view.select(
            group_col,
            F.col("n_rows").alias("d_rows"),
            F.col("sum_value").alias("d_value"),
        )
        .unionByName(adj)
        .groupBy(group_col)
        .agg(
            F.sum("d_rows").alias("n_rows"),
            F.sum("d_value").alias("sum_value"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return folded
