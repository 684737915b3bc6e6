"""Skew mitigation by key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

- a single hot GROUP BY key whose partial aggregate still overwhelms
  one reducer (AQE can split joins, not a single agg partition);
- a broadcast-ineligible join against a dimension where one fact key
  is a large fraction of the table.

``salted_aggregate`` runs the classic two-phase plan: aggregate on
(key, salt) first — spreading the hot key over ``n_salts`` reducers —
then re-aggregate on the key. Only decomposable aggregates are
offered (sum/count/min/max), because those re-aggregate losslessly.

``salted_join`` replicates the dimension side ``n_salts`` times (one
copy per salt) and salts the fact side deterministically, turning one
hot key partition into ``n_salts`` smaller ones.

Salts are DETERMINISTIC (hash of the row's key + a mixing column, not
rand()): retries and replays produce identical partitioning, which the
exactly-once MERGE path (K1) relies on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]

_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}
_FIRST = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def _salt(df: DataFrame, mix_cols: Sequence[str], n_salts: int):
    # xxhash64 of the mixing columns: deterministic, uniform, cheap
    return F.pmod(F.xxhash64(*[F.col(c) for c in mix_cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
    mix_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: (column, fn, alias) with fn in {sum, count, min, max}.
    ``mix_cols``: columns hashed into the salt; defaults to all
    non-key columns so a hot key's rows spread evenly.
    """
    for _, fn, _ in aggs:
        if fn not in _FIRST:
            raise ValueError(f"{fn!r} is not decomposable; use sum/count/min/max")
    mix = list(mix_cols) if mix_cols else [c for c in df.columns if c not in keys]
    if not mix:
        raise ValueError("need at least one non-key column to mix the salt")
    salted = df.withColumn("__salt", _salt(df, mix, n_salts))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_FIRST[fn](col).alias(alias) for col, fn, alias in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[_REAGG[fn](alias).alias(alias) for _, fn, alias in aggs]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    mix_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: dim replicated per salt, fact salted.

    Output columns = fact columns + dim columns (minus dim's key,
    which equals fact's). Dim grows n_salts×, so keep it small —
    which is exactly the skewed-fact-vs-dimension case this targets.
    """
    mix = list(mix_cols) if mix_cols else [c for c in fact.columns if c != key]
    if not mix:
        raise ValueError("need at least one non-key fact column to mix the salt")
    f = fact.withColumn("__salt", _salt(fact, mix, n_salts))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed(key, "__dim_key")
    out = f.join(
        d,
        (F.col(key) == F.col("__dim_key")) & (f["__salt"] == d["__salt"]),
        how,
    )
    return out.drop("__salt").drop("__dim_key")
