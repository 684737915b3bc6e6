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

Commit-scaling probe (SPARK_GRAFT_SILVER_COMMITS=N): the long-lived
table regime the per-op steps can't see — N narrow MOR merges with the
auto-OPTIMIZE policy (maybe_optimize, Delta auto-compaction analog),
sampling manifest size, _manifest_raw load cost, files()/history()
latency, and count_rows at checkpoints, then vacuum reclamation at the
end.  Any metadata op super-linear in committed generations is exactly
what degrades first under production streams.  Prints a SECOND JSON
line: {"metric": "huracan_spark_silver_commits", "samples": [...],
"vacuum": {...}, "n_commits": N}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _commit_scaling_probe(spark, batch, root: str, n_commits: int) -> None:
    """N narrow MOR merges + auto-OPTIMIZE; metadata-op latency sampled
    at checkpoints.  Narrow batches are what a streaming writer commits
    per trigger — the regime that fragments manifests."""
    import pyspark.sql.functions as F

    from huracan_spark.pipeline.silver import SilverTable

    t = SilverTable(spark, os.path.join(root, "tc"), n_buckets=16)
    seed = batch.limit(10_000).localCheckpoint(eager=True)
    t.merge(seed)
    keys = [r["_id"] for r in seed.select("_id").limit(400).collect()]

    checkpoints = sorted(
        {max(n_commits // 8, 1), n_commits // 4, n_commits // 2,
         3 * n_commits // 4, n_commits} - {0}
    )
    samples = []
    compactions = 0
    t0_all = time.perf_counter()
    for i in range(1, n_commits + 1):
        # 20-key narrow batch, deterministic rotation through the keyspace
        ks = [keys[(i * 7 + j) % len(keys)] for j in range(20)]
        nb = (
            seed.filter(F.col("_id").isin(ks))
            .withColumn("version_", F.lit(i + 1).cast("long"))
            .localCheckpoint(eager=True)
        )
        t.merge(nb, write_mode="mor")
        compactions += 1 if t.maybe_optimize(max_refs=12) else 0
        if i in checkpoints:
            gen = t.current_generation()
            man_path = os.path.join(t.path, gen, "manifest.json")
            man_bytes = os.path.getsize(man_path) if os.path.exists(man_path) else None
            s0 = time.perf_counter()
            t._manifest_raw(gen)
            manifest_load = time.perf_counter() - s0
            s0 = time.perf_counter()
            fdf = t.files()
            n_files = fdf.count() if fdf is not None else 0
            files_latency = time.perf_counter() - s0
            s0 = time.perf_counter()
            hist = t.history()
            history_latency = time.perf_counter() - s0
            s0 = time.perf_counter()
            t.count_rows()
            count_latency = time.perf_counter() - s0
            samples.append({
                "commit": i,
                "generations": len(t.generations()),
                "referenced": len(t.referenced_generations()),
                "manifest_bytes": man_bytes,
                "manifest_load_s": round(manifest_load, 4),
                "files_s": round(files_latency, 4),
                "n_files": n_files,
                "history_s": round(history_latency, 4),
                "history_len": len(hist),
                "count_rows_s": round(count_latency, 4),
            })
    wall = round(time.perf_counter() - t0_all, 4)

    gens_before = len(t.generations())
    s0 = time.perf_counter()
    removed = t.vacuum(keep=3)
    vacuum_s = round(time.perf_counter() - s0, 4)
    print(json.dumps({
        "metric": "huracan_spark_silver_commits",
        "unit": "sec",
        "n_commits": n_commits,
        "total_commit_wall_s": wall,
        "compactions": compactions,
        "samples": samples,
        "vacuum": {
            "gens_before": gens_before,
            "removed": len(removed),
            "gens_after": len(t.generations()),
            "vacuum_s": vacuum_s,
        },
    }))


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

    n_commits = int(os.environ.get("SPARK_GRAFT_SILVER_COMMITS", "0"))
    if n_commits:
        _commit_scaling_probe(spark, batch, root, n_commits)


if __name__ == "__main__":
    sys.exit(main())
