"""Benchmark runner: all registered queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully executed (count + collect of a bounded head) so
lazy plans can't cheat; per-query wall time includes planning +
execution.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from huracan_spark.queries.registry import REGISTRY, spark_queries
    from huracan_spark.session import get_spark

    spark_queries()
    spark = get_spark("huracan-bench")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the queries, not first-touch JIT/IO
    from huracan_spark.sources.tables import load_all

    for df in load_all(spark, sf_dir).values():
        df.count()

    per_query: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # noop sink: full plan execution (count() would let Catalyst
        # prune projection-only work like hash/fingerprint columns)
        df.write.mode("overwrite").format("noop").save()
        per_query[name] = round(time.perf_counter() - t0, 4)
        # drop per-query DataFrame persists so caches from earlier
        # queries can't pressure later measurements (localCheckpointed
        # shared state — e.g. the dedup cluster-labels table — is RDD
        # blocks, not catalog cache, and survives this on purpose)
        spark.catalog.clearCache()
    total = round(time.perf_counter() - t_total0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "huracan_spark_query_suite",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
