"""Benchmark runner: all registered queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

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


if __name__ == "__main__":
    sys.exit(main())
