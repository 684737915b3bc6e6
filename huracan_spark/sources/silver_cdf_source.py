"""Silver change feed as a STREAMING source (Delta readChangeFeed
parity).

Delta exposes ``spark.readStream.format("delta").option(
"readChangeFeed", "true")`` — a stream of row-level changes driven by
the commit log.  SilverTable's generation manifests carry the same
information, surfaced here through Spark 4's Python DataSource API:

- stream OFFSETS are generation names (the commit log positions);
- each micro-batch covers the generation pairs committed since the
  last offset, and fans out one ``InputPartition`` PER CHANGED BUCKET
  per pair — executors read only the delta's buckets in parallel
  (manifest file-skipping, `pipeline/silver.py::changed_buckets`),
  so a batch costs the delta, not the table;
- partition reads are pure pyarrow/stdlib (no SparkSession on the
  executor), classify changes exactly like ``SilverTable.diff``
  (insert / update / delete, plus ``drop`` for audit-visibility of
  impossible new-side nulls), and include equal-version tombstone
  flips;
- replaying a committed offset range after restart re-reads the same
  immutable generation files — replay-stable by construction (the
  property the K1 idempotent-MERGE sink assumes).  Vacuum keeps every
  retained generation readable; streams resuming from beyond the
  vacuum horizon fail loudly on the missing manifest rather than
  silently skipping commits.

Usage::

    register_silver_cdf_source(spark)
    feed = (spark.readStream.format("silver_cdf")
            .option("path", table_path)
            .option("starting", "earliest")   # or "latest" / a gen name
            .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SilverCdfStreamDataSource", "register_silver_cdf_source"]

CDF_SCHEMA = (
    "_id string, change_type string, old_version bigint, "
    "new_version bigint, _commit_generation string"
)


def _gens(path: str) -> list[str]:
    """Committed generations, oldest first (manifest-less in-flight
    dirs excluded) — pure file IO, callable on driver or executor."""
    if not os.path.isdir(path):
        return []
    return sorted(
        d
        for d in os.listdir(path)
        if d.startswith("gen-")
        and os.path.isfile(os.path.join(path, d, "manifest.json"))
    )


def _manifest_buckets(path: str, gen: str) -> dict[str, str]:
    with open(os.path.join(path, gen, "manifest.json")) as f:
        return json.load(f)["buckets"]


def _current(path: str) -> str | None:
    ptr = os.path.join(path, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)["generation"]


class _CdfPartition(InputPartition):
    def __init__(self, table_path, gen, old_rel, new_rel):
        self.table_path = table_path
        self.gen = gen  # the generation whose commit produced the change
        self.old_rel = old_rel  # bucket data dir before (None = new bucket)
        self.new_rel = new_rel  # bucket data dir after (None = impossible drop)


def _load_bucket(table_path: str, rel: str | None) -> dict:
    """{_id: (version, deleted)} for one bucket data dir."""
    if rel is None:
        return {}
    import pyarrow.parquet as pq

    out = {}
    d = os.path.join(table_path, rel)
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(d, fn), columns=["_id", "version_", "deleted"]
        )
        for r in t.to_pylist():
            out[r["_id"]] = (r["version_"], bool(r["deleted"]))
    return out


class _SilverCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.starting = options.get("starting", "latest")

    def initialOffset(self) -> dict:
        gens = _gens(self.path)
        if self.starting == "earliest":
            return {"generation": gens[0] if gens else ""}
        if self.starting == "latest":
            return {"generation": _current(self.path) or ""}
        if self.starting not in gens:
            raise ValueError(
                f"unknown starting generation {self.starting!r}"
            )
        return {"generation": self.starting}

    def latestOffset(self) -> dict:
        return {"generation": _current(self.path) or ""}

    def partitions(self, start: dict, end: dict):
        gens = _gens(self.path)
        s, e = start["generation"], end["generation"]
        if not e or s == e:
            return []
        lo = gens.index(s) if s else 0
        hi = gens.index(e)
        parts = []
        for prev, cur in zip(gens[lo:hi], gens[lo + 1 : hi + 1]):
            mo = _manifest_buckets(self.path, prev)
            mn = _manifest_buckets(self.path, cur)
            for b in sorted(set(mo) | set(mn)):
                if mo.get(b) != mn.get(b):
                    parts.append(
                        _CdfPartition(self.path, cur, mo.get(b), mn.get(b))
                    )
        return parts

    def read(self, partition: _CdfPartition):
        old = _load_bucket(partition.table_path, partition.old_rel)
        new = _load_bucket(partition.table_path, partition.new_rel)
        for _id in sorted(set(old) | set(new)):
            o, n = old.get(_id), new.get(_id)
            # same changed-row predicate and classification as
            # SilverTable.diff: version differs OR deleted differs
            if o is not None and n is not None and o == n:
                continue
            if n is None:
                ct = "drop"  # impossible by K2; surfaced for audit
            elif o is None:
                ct = "delete" if n[1] else "insert"
            elif n[1] and not o[1]:
                ct = "delete"
            else:
                ct = "update"
            yield (
                _id,
                ct,
                o[0] if o else None,
                n[0] if n else None,
                partition.gen,
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable generation names; nothing to ack


class SilverCdfStreamDataSource(DataSource):
    """``spark.readStream.format("silver_cdf")``."""

    @classmethod
    def name(cls) -> str:
        return "silver_cdf"

    def schema(self) -> str:
        return CDF_SCHEMA

    def streamReader(self, schema) -> _SilverCdfStreamReader:
        return _SilverCdfStreamReader(self.options)


def register_silver_cdf_source(spark) -> None:
    spark.dataSource.register(SilverCdfStreamDataSource)
