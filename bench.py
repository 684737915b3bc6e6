"""Benchmark runner: all registered queries at $SPARK_GRAFT_SF_DIR.

Prints the full result JSON line (queries + groups maps) first, then a
COMPACT summary as the FINAL stdout line:
  {"metric": ..., "value": total_sec, "unit": "sec", "n_queries": N,
   "n_groups": G, "queries_total": Q, "groups_total": B, "sf": ...,
   "detail": "BENCH_DETAIL.json"}
The full per-query/per-group maps are also written to the sidecar file
``BENCH_DETAIL.json`` next to this script.  Rationale: the driver's
bench capture keeps only a 2000-char stdout tail — a ~218-entry query
map overflows it and the official record parsed as null for six
straight rounds.  The compact last line always fits the tail; the
sidecar (committed with the round) carries the machine-readable detail.

Each query is fully executed (count + collect of a bounded head) so
lazy plans can't cheat; per-query wall time includes planning +
execution.

``SPARK_GRAFT_BENCH_REPEAT=N`` (default 1) runs the whole suite N
times in one JVM and reports each query's MINIMUM — the BASELINE.md
floor-measurement methodology (GC stalls land on random queries, so
per-query minima over repeats are the stable signal; a single-run
total scatters with ambient load).  ``value`` is then the sum of
minima and the line carries "repeat": N.

Shared-materialization attribution: pipelines built ONCE per (app,
sf_dir) — dedup label tables, silver on-disk drives, the streaming
staging run — report their one-time build cost under ``groups``
(first-consumer attribution via ``queries/matcost.py``), and the
member queries' numbers are the steady cached-read costs.  Without
this, whichever member ran first absorbed the whole build in its
number while the published floor (a warm-cache minimum) didn't, and
every bench diff flagged phantom ">100x" regressions on it.
``value`` = sum of per-query times + sum of group build costs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "1")), 1)
    from huracan_spark.queries.registry import REGISTRY, spark_queries
    from huracan_spark.session import get_spark

    spark_queries()
    spark = get_spark("huracan-bench")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the queries, not first-touch JIT/IO
    from huracan_spark.sources.tables import load_all

    for df in load_all(spark, sf_dir).values():
        df.count()

    from huracan_spark.queries import matcost

    matcost.drain()  # table warm-up must not charge any group
    per_query: dict[str, float] = {}
    groups: dict[str, float] = {}
    for _ in range(repeat):
        for name, spec in sorted(REGISTRY.items()):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink: full plan execution (count() would let Catalyst
            # prune projection-only work like hash/fingerprint columns)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            # shared builds triggered by this query are charged to their
            # named group, not to whichever member happened to run first
            for grp, cost in matcost.drain():
                groups[grp] = round(groups.get(grp, 0.0) + cost, 4)
                dt -= cost
            dt = round(max(dt, 0.0), 4)
            prev = per_query.get(name)
            per_query[name] = dt if prev is None else min(prev, dt)
            # drop per-query DataFrame persists so caches from earlier
            # queries can't pressure later measurements (localCheckpointed
            # shared state — e.g. the dedup cluster-labels table — is RDD
            # blocks, not catalog cache, and survives this on purpose)
            spark.catalog.clearCache()
    total = round(sum(per_query.values()) + sum(groups.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "huracan_spark_query_suite",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "groups": groups,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if repeat > 1:
        out["repeat"] = repeat
    print(json.dumps(out))

    # sidecar with the full maps + compact FINAL line (see module doc)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(out, fh, indent=1)
    summary = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "n_queries": len(per_query),
        "n_groups": len(groups),
        "queries_total": round(sum(per_query.values()), 4),
        "groups_total": round(sum(groups.values()), 4),
        "sf": out["sf"],
        "detail": "BENCH_DETAIL.json",
    }
    if repeat > 1:
        summary["repeat"] = repeat
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
