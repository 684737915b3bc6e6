"""Shared query-measurement loop for bench.py and tools/scale_rehearsal.py.

The rehearsal's scaling exponents are only comparable to BASELINE.md's
floors if both runners measure identically — warm-up, noop full-plan
sink, matcost group attribution, per-query min fold, cache hygiene.
One implementation, two callers.
"""

from __future__ import annotations

import time


def measure_queries(
    spark, sf_dir: str, names: list[str], repeat: int = 1,
    verbose: bool = False,
) -> tuple[dict[str, float], dict[str, float]]:
    """Run each registered query fully at ``sf_dir``; returns
    (per_query_seconds, group_build_seconds).

    - warms the JVM + parquet footers first so per-query numbers
      measure the queries, not first-touch JIT/IO
    - executes via the noop sink: count() would let Catalyst prune
      projection-only work like hash/fingerprint columns
    - drains ``matcost.BUILD_LEDGER`` after each query: shared
      one-time builds are charged to their named GROUP, not to
      whichever member ran first (builds fire once per (app, sf_dir),
      so only the first repeat sees them — accumulate, don't min)
    - per-query value is the MINIMUM over ``repeat`` passes (GC stalls
      land on random queries; minima are the stable signal)
    - clears the catalog cache between queries so one query's persists
      can't pressure the next (localCheckpointed shared state is RDD
      blocks, not catalog cache, and survives on purpose)
    - ``verbose`` prints one stderr line per completed query, so a
      crash mid-run (the decade-3 rehearsal's disk-spill abort) still
      leaves the completed measurements recoverable from the log
    """
    import sys
    from huracan_spark.queries import matcost
    from huracan_spark.queries.registry import REGISTRY
    from huracan_spark.sources.tables import load_all

    for df in load_all(spark, sf_dir).values():
        df.count()
    matcost.drain()  # warm-up must not charge any group

    per_query: dict[str, float] = {}
    groups: dict[str, float] = {}
    for _ in range(max(repeat, 1)):
        for name in names:
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            for grp, cost in matcost.drain():
                groups[grp] = round(groups.get(grp, 0.0) + cost, 4)
                dt -= cost
                if verbose:
                    print(f"#group {sf_dir} {grp} {cost}",
                          file=sys.stderr, flush=True)
            dt = round(max(dt, 0.0), 4)
            prev = per_query.get(name)
            per_query[name] = dt if prev is None else min(prev, dt)
            if verbose:
                print(f"#done {sf_dir} {name} {dt}", file=sys.stderr, flush=True)
            spark.catalog.clearCache()
    return per_query, groups
