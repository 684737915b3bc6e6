"""Data-skipping statistics over silver bucket files (Delta parity).

Delta Lake records per-file column min/max/null-count in its
transaction log and prunes files whose stats prove a predicate can
never match.  SilverTable gets the same behavior over plain parquet:

- at commit time, stats are harvested from the parquet FOOTERS of the
  just-written bucket files (``pyarrow`` metadata read — no extra
  Spark job, no data scan; the writer already paid for the footers);
- the manifest carries ``stats: {bucket_id: {col: {min, max,
  null_count, n_rows}}}``; untouched buckets inherit their previous
  stats verbatim, so stat maintenance costs O(touched), like the
  merge itself;
- ``SilverTable.read_where`` evaluates conjunctive range predicates
  against the stats and reads ONLY buckets that might match — at
  100 TB a ``version_ > N`` incremental read touches the few buckets
  with fresh data instead of the whole table.

Pruning is conservative: buckets without stats (pre-feature
generations, non-primitive columns) are always read, and the full
predicate is re-applied as a Spark filter, so skipping can only
remove provably-dead IO, never rows.

Reference parity: the reference's Mongo indexes serve the same role
for its conditional bulk updates (main/src/etl.rs:1244-1267); Delta's
``stats`` JSON is the public design this follows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "collect_dir_stats",
    "collect_file_stats",
    "merge_stats",
    "merge_persisted",
    "bucket_might_match",
    "filters_to_column",
]

# stats are kept only for types whose values are JSON-round-trippable
# and totally ordered under Python comparison on both write and read
_SUPPORTED = (bool, int, float, str)


def _norm_stat_value(v):
    """Normalize a footer stat value to (json_safe_value, kind).
    Temporal values map to integers — epoch micros for timestamps
    (naive treated as session-UTC, aware converted), proleptic ordinal
    for dates — so they stay JSON-round-trippable and totally ordered.
    Returns (None, None) for unsupported types."""
    import datetime as dt

    if isinstance(v, _SUPPORTED):
        return v, None
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        delta = v - dt.datetime(1970, 1, 1)
        return (
            (delta.days * 86_400 + delta.seconds) * 1_000_000
            + delta.microseconds,
            "ts",
        )
    if isinstance(v, dt.date):
        return v.toordinal(), "date"
    return None, None


def _norm_filter_value(value, kind):
    """Normalize ONE predicate value against a column's stat kind;
    None means the comparison cannot be proven — never prune."""
    if kind is None:
        return value if isinstance(value, _SUPPORTED) else None
    nv, nk = _norm_stat_value(value)
    return nv if nk == kind else None


def _file_stats(path: str) -> dict[str, dict]:
    """Per-column {min,max,null_count,n_rows} from ONE parquet file's
    footer.  Nested/unsupported columns are omitted (never pruned)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — skip, never prunable
                continue
            st = col.statistics
            if st is None:
                # no stats for this chunk: poison the column — a
                # partial min/max would wrongly prune rows from the
                # statless chunk
                out[name] = {"ok": False}
                continue
            ent = out.setdefault(
                name,
                {"ok": True, "min": None, "max": None, "null_count": 0, "n_rows": 0},
            )
            if not ent["ok"]:
                continue
            ent["n_rows"] += row_group.num_rows
            if st.null_count is not None:
                ent["null_count"] += st.null_count
            if st.has_min_max:
                mn, kn = _norm_stat_value(st.min)
                mx, kx = _norm_stat_value(st.max)
                if mn is None or mx is None or kn != kx:
                    out[name] = {"ok": False}
                    continue
                if ent["min"] is not None and ent.get("kind") != kn:
                    out[name] = {"ok": False}  # chunks disagree on kind
                    continue
                ent["kind"] = kn
                ent["min"] = mn if ent["min"] is None else min(ent["min"], mn)
                ent["max"] = mx if ent["max"] is None else max(ent["max"], mx)
            elif st.null_count is None or st.null_count < row_group.num_rows:
                # non-null values present but no min/max recorded
                out[name] = {"ok": False}
    return out


def _strip(stats: dict[str, dict]) -> dict[str, dict]:
    """Drop poisoned columns, the bookkeeping flag, and null kind
    markers before persisting."""
    return {
        c: {
            k: v
            for k, v in ent.items()
            if k != "ok" and not (k == "kind" and v is None)
        }
        for c, ent in stats.items()
        if ent.get("ok")
    }


def collect_dir_stats(data_dir: str) -> dict[str, dict] | None:
    """Aggregate footer stats over every parquet file in a bucket data
    dir.  Returns None when the dir has no parquet files."""
    per_file = collect_file_stats(data_dir, _raw=True)
    if not per_file:
        return None
    merged = None
    for fs in per_file.values():
        merged = fs if merged is None else merge_stats(merged, fs)
    return _strip(merged)


def collect_file_stats(data_dir: str, _raw: bool = False) -> dict[str, dict]:
    """Per-FILE footer stats for every parquet file in a bucket data
    dir — the finer skipping granularity: after a clustered OPTIMIZE
    (``compact(cluster_by=...)``) the files within a bucket hold
    disjoint value ranges, so a range predicate opens only the files
    it can match, not the whole bucket (Delta's per-file stats)."""
    import os

    out = {}
    for fn in sorted(os.listdir(data_dir)):
        if fn.endswith(".parquet"):
            fs = _file_stats(os.path.join(data_dir, fn))
            out[fn] = fs if _raw else _strip(fs)
    return out


def merge_stats(a: dict[str, dict], b: dict[str, dict]) -> dict[str, dict]:
    """Union of two per-column stat maps; a column missing or poisoned
    on either side is poisoned (files disagree on its prunability)."""
    out: dict[str, dict] = {}
    for c in set(a) | set(b):
        ea, eb = a.get(c), b.get(c)
        if ea is None or eb is None or not (ea.get("ok") and eb.get("ok")):
            out[c] = {"ok": False}
            continue
        kinds = {k for k in (ea.get("kind"), eb.get("kind")) if k is not None}
        if len(kinds) > 1:
            out[c] = {"ok": False}  # files disagree on the value kind
            continue
        mins = [v for v in (ea["min"], eb["min"]) if v is not None]
        maxs = [v for v in (ea["max"], eb["max"]) if v is not None]
        out[c] = {
            "ok": True,
            "kind": kinds.pop() if kinds else None,
            "min": min(mins) if mins else None,
            "max": max(maxs) if maxs else None,
            "null_count": ea["null_count"] + eb["null_count"],
            "n_rows": ea["n_rows"] + eb["n_rows"],
        }
    return out


def merge_persisted(
    a: dict[str, dict] | None, b: dict[str, dict] | None
) -> dict[str, dict] | None:
    """Merge two PERSISTED (stripped) stat maps — e.g. a bucket's
    carried stats with a merge-on-read delta's fresh stats.  None if
    either side is missing (no stats -> never prune, conservative)."""
    if a is None or b is None:
        return None
    ia = {c: {**e, "ok": True} for c, e in a.items()}
    ib = {c: {**e, "ok": True} for c, e in b.items()}
    return _strip(merge_stats(ia, ib))


def bucket_might_match(stats: dict[str, dict] | None, filters) -> bool:
    """Conservative containment test: False ONLY when the stats prove
    no row in the bucket can satisfy the conjunction.

    ``filters`` is a list of ``(col, op, value)`` with op in
    ``= != < <= > >= in`` and a non-null value (a list/tuple for
    ``in``).  SQL comparison semantics: a null cell satisfies
    nothing, so a bucket whose column is all null is skippable for
    any comparison on it.  ``!=`` never prunes on min/max (any
    in-range bucket may hold other values).
    """
    if stats is None:
        return True
    for col, op, value in filters:
        ent = stats.get(col)
        if ent is None:
            continue  # no stats for this column — cannot prune
        mn, mx = ent.get("min"), ent.get("max")
        n, nulls = ent.get("n_rows", 0), ent.get("null_count", 0)
        if n > 0 and nulls >= n:
            return False  # all null: no comparison can hold
        if mn is None or mx is None:
            continue
        kind = ent.get("kind")
        if op == "in":
            vals = [_norm_filter_value(v, kind) for v in value]
            if any(v is None for v in vals):
                continue  # unprovable membership — never prune
            value = vals
        else:
            value = _norm_filter_value(value, kind)
            if value is None:
                continue  # kind mismatch — never prune
        try:
            if op == "=" and (value < mn or value > mx):
                return False
            if op == "in" and all(v < mn or v > mx for v in value):
                return False
            if op == "<" and mn >= value:
                return False
            if op == "<=" and mn > value:
                return False
            if op == ">" and mx <= value:
                return False
            if op == ">=" and mx < value:
                return False
        except TypeError:
            continue  # cross-type comparison — never prune on it
    return True


def filters_to_column(filters) -> Column:
    """The exact Spark predicate for the same conjunction — re-applied
    after pruning so skipping is an IO optimization, never a semantic
    one."""
    ops = {
        "=": lambda c, v: c == v,
        "!=": lambda c, v: c != v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
    }
    pred = F.lit(True)
    for col, op, value in filters:
        if op == "in":
            pred = pred & F.col(col).isin(*list(value))
        else:
            pred = pred & ops[op](F.col(col), F.lit(value))
    return pred
