"""Profile one silver/streaming drive query in isolation.

Usage:
    python3 tools/silver_profile.py QUERY_NAME [--cprofile] [--sf DIR]

Runs the registered query function once in a fresh process (the
first-consumer build path), reporting wall time and, with --cprofile,
the top driver-side Python frames by cumulative time.  This is the
round-11 attribution tool for the silver commit-path overhead
(VERDICT r10 item 1): separates executor compute from driver-side
Catalyst analysis / Py4J round-trips inside merge()/persist/write.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_cprofile = "--cprofile" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    name = args[0]

    from huracan_spark.queries.registry import REGISTRY, spark_queries
    from huracan_spark.session import get_spark

    spark_queries()
    spark = get_spark("silver-profile")
    fn = REGISTRY[name].fn

    # warm the session the way benchlib does (tiny action so JVM/py4j
    # bridge init is not charged to the query)
    spark.range(1).count()

    t0 = time.monotonic()
    if use_cprofile:
        prof = cProfile.Profile()
        prof.enable()
        df = fn(spark, sf_dir)
        prof.disable()
    else:
        df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    t1 = time.monotonic()
    print(f"[silver_profile] {name}: {t1 - t0:.3f} s wall (sf={sf_dir})")

    from huracan_spark.queries.matcost import BUILD_LEDGER

    for grp, cost in BUILD_LEDGER:
        print(f"[silver_profile] group {grp}: {cost:.3f} s")

    if use_cprofile:
        s = io.StringIO()
        st = pstats.Stats(prof, stream=s)
        st.sort_stats("cumulative")
        st.print_stats(60)
        print(s.getvalue())

    spark.stop()


if __name__ == "__main__":
    main()
