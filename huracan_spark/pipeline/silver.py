"""Silver current-state table: persistent, versioned-MERGE maintained.

The Mongo ``{env}_{net}_objects`` collection analog (mongo.rs:19-21).
Without Delta in this environment, MERGE is union+re-reduce over
parquet generations with an atomic pointer swap — the semantics
(K1 conditional upsert, K2 tombstones, idempotent replay) are
identical to the Delta ``MERGE INTO`` documented in
operators/compaction.py, and the storage layout swaps in trivially.

Scale notes: state is hash-partitioned (bucketed) by ``_id`` on disk
so successive merges co-partition without a full reshuffle of the
state side; the incoming batch is the only side that shuffles.  At
100 TB the generation rewrite becomes Delta/Iceberg MERGE with file
skipping — the operator contract stays the same.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.operators.compaction import merge_into

__all__ = ["SilverTable", "MergeMetrics"]


class MergeMetrics:
    """K3/K8 write-result audit: inserted/modified/unchanged counts
    (etl.rs:1280-1318)."""

    def __init__(self, inserted: int, modified: int, unchanged: int):
        self.inserted = inserted
        self.modified = modified
        self.unchanged = unchanged

    def as_dict(self) -> dict[str, int]:
        return {
            "inserted": self.inserted,
            "modified": self.modified,
            "unchanged": self.unchanged,
        }


class SilverTable:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 32):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_generation(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return json.load(f)["generation"]

    def generations(self) -> list[str]:
        """All persisted state generations, oldest first (S7 time travel:
        the reference's unused past-object lookups, client.rs:92-109,
        map to reading an older generation)."""
        return sorted(
            d for d in os.listdir(self.path)
            if d.startswith("gen-") and os.path.isdir(os.path.join(self.path, d))
        )

    def read(self, generation: str | None = None) -> DataFrame | None:
        gen = generation or self.current_generation()
        if gen is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, gen))

    def vacuum(self, keep: int = 3) -> list[str]:
        """Drop all but the newest ``keep`` generations (never the
        current one).  Returns removed generation names."""
        import shutil

        current = self.current_generation()
        gens = self.generations()
        removable = [g for g in gens[:-keep] if g != current] if keep else [
            g for g in gens if g != current
        ]
        for g in removable:
            shutil.rmtree(os.path.join(self.path, g))
        return removable

    def merge(self, batch: DataFrame, collect_metrics: bool = False) -> MergeMetrics | None:
        """Versioned MERGE of a batch of silver-shaped rows (K1/K2).

        The batch may contain multiple versions per _id and duplicate
        rows — ``merge_into`` pre-reduces, exactly as K1 requires
        unique source keys (SURVEY §7.2)."""
        current = self.read()
        metrics = None
        if current is None:
            new_state = merge_into(
                batch.limit(0), batch, key="_id", version="version_"
            )
            if collect_metrics:
                n = new_state.count()
                metrics = MergeMetrics(inserted=n, modified=0, unchanged=0)
        else:
            new_state = merge_into(current, batch, key="_id", version="version_")
            if collect_metrics:
                # audit via a version comparison join (Delta op-metrics analog)
                old = current.select("_id", F.col("version_").alias("_old_v"))
                bat = batch.groupBy("_id").agg(F.max("version_").alias("_new_v"))
                j = bat.join(old, "_id", "left")
                counts = j.agg(
                    F.sum(F.when(F.col("_old_v").isNull(), 1).otherwise(0)).alias("ins"),
                    F.sum(
                        F.when(F.col("_new_v") > F.col("_old_v"), 1).otherwise(0)
                    ).alias("mod"),
                    F.sum(
                        F.when(F.col("_new_v") <= F.col("_old_v"), 1).otherwise(0)
                    ).alias("unch"),
                ).first()
                metrics = MergeMetrics(
                    inserted=counts.ins or 0,
                    modified=counts.mod or 0,
                    unchanged=counts.unch or 0,
                )
        ts = int(time.time() * 1000)
        gen, seq = f"gen-{ts}", 0
        # same-millisecond merges must not clobber an existing
        # generation (overwrite mode would silently replace it)
        while os.path.exists(os.path.join(self.path, gen)):
            seq += 1
            gen = f"gen-{ts}-{seq:03d}"
        out = os.path.join(self.path, gen)
        # repartition by _id so the next merge's state side is already
        # clustered on the merge key
        new_state.repartition(self.n_buckets, "_id").write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"generation": gen}, f)
        os.replace(tmp, self._pointer)  # atomic swap
        return metrics
