"""Silver-table OPS benchmark: the lakehouse stack under realistic
bucket counts, timed per step.

The query suite benches READS; every silver timing there comes from
tiny on-disk fixtures inside oracle queries, so manifest/metadata hot
spots (manifest JSON size, bloom harvest job, footer-stat reads) would
be invisible until a real deployment.  This probe merges the
$SPARK_GRAFT_SF_DIR events table into a SilverTable at
$SPARK_GRAFT_SILVER_BUCKETS buckets (default 256 — the bucket count a
100 TB deployment would start from, scaled to fixture size) and times
each lifecycle step.  Prints ONE JSON line:

  {"metric": "huracan_spark_silver_ops", "unit": "sec",
   "value": total_sec, "steps": {step: sec, ...},
   "n_buckets": N, "n_rows": R, "sf": ...}

Steps (each O(touched buckets) by design — a super-linear step here
is a scale bug):

  seed_merge        full COW merge of the events-derived batch
  incr_merge_cow    1%-of-keys COW update (touches ~all buckets at
                    256 x 1% keys, the honest worst case)
  incr_merge_mor    same batch as a MOR delta commit (O(batch) IO)
  delete_dv         predicate DELETE as deletion vectors (no rewrite)
  read_full         full-state read + count (reconciling MOR + DV)
  read_point        key lookup via read_key_bucket (1 bucket)
  read_pruned       stats-pruned predicate read (prune_plan path)
  compact           OPTIMIZE: absorb deltas/DVs, rewrite all buckets
  count_rows_meta   O(metadata) row count after compact (no Spark job)
  time_travel       read_as_of the seed commit + count
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_buckets = int(os.environ.get("SPARK_GRAFT_SILVER_BUCKETS", "256"))
    from pyspark.sql import functions as F

    from huracan_spark.pipeline.silver import SilverTable
    from huracan_spark.session import get_spark
    from huracan_spark.sources.tables import load_table

    spark = get_spark("huracan-bench-silver")
    ev = load_table(spark, sf_dir, "events")
    batch = ev.select(
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("_id"),
        F.lit(1).cast("long").alias("version_"),
        F.lit(False).alias("deleted"),
        "event_type",
        F.col("user_id").cast("long").alias("user_id"),
        F.round("value", 6).alias("value"),
    ).localCheckpoint(eager=True)
    n_rows = batch.count()

    # 1% of keys, new version — the steady-state incremental regime
    upd = (
        batch.filter(F.col("_id").substr(-2, 2) == "17")
        .withColumn("version_", F.lit(2).cast("long"))
        .withColumn("value", F.round(F.col("value") * 2, 6))
        .localCheckpoint(eager=True)
    )
    upd.count()

    root = tempfile.mkdtemp(prefix="hs_bench_silver_")
    t = SilverTable(spark, os.path.join(root, "t"), n_buckets=n_buckets)

    steps: dict[str, float] = {}

    def timed(name: str, fn) -> object:
        t0 = time.perf_counter()
        out = fn()
        steps[name] = round(time.perf_counter() - t0, 4)
        return out

    timed("seed_merge", lambda: t.merge(batch))
    seed_gen = t.current_generation()
    timed("incr_merge_cow", lambda: t.merge(upd))
    mor_upd = upd.withColumn("version_", F.lit(3).cast("long"))
    timed("incr_merge_mor", lambda: t.merge(mor_upd, write_mode="mor"))
    timed(
        "delete_dv",
        lambda: t.delete_where(
            [("user_id", "=", 7)], write_mode="dv"
        ),
    )
    timed("read_full", lambda: t.read().count())
    timed(
        "read_point",
        lambda: t.read_key_bucket("e100").filter(
            F.col("_id") == "e100"
        ).count(),
    )
    timed(
        "read_pruned",
        lambda: (
            lambda df: df.count() if df is not None else 0
        )(t.read_where([("user_id", "=", 3)])),
    )
    timed("compact", lambda: t.compact())
    timed("count_rows_meta", lambda: t.count_rows())
    timed("time_travel", lambda: t.read(generation=seed_gen).count())

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "huracan_spark_silver_ops",
                "value": round(sum(steps.values()), 4),
                "unit": "sec",
                "steps": steps,
                "n_buckets": n_buckets,
                "n_rows": n_rows,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
