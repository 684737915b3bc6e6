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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_cprofile = "--cprofile" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    name = args[0]

    # the REST job probe needs the UI server (off in the bench session)
    os.environ.setdefault("SPARK_GRAFT_UI", "true")

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

    # job-level attribution (guide §8 REST probe): sum of executed job
    # spans vs wall separates cluster compute from driver-side gaps
    # (Catalyst analysis, manifest IO, Py4J chatter between jobs)
    try:
        import json as _json
        from datetime import datetime
        from urllib.request import urlopen

        app_id = spark.sparkContext.applicationId
        with urlopen(
            f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            jobs = _json.load(r)

        def _ts(s):
            return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()

        spans = sorted(
            (_ts(j["submissionTime"]), _ts(j["completionTime"]))
            for j in jobs
            if "completionTime" in j
        )
        total = sum(b - a for a, b in spans)
        # union of job spans (overlapping jobs counted once)
        covered, hi = 0.0, None
        for a, b in spans:
            if hi is None or a > hi:
                covered += b - a
                hi = b
            elif b > hi:
                covered += b - hi
                hi = b
        print(
            f"[silver_profile] jobs={len(spans)} job-span sum={total:.3f} s "
            f"union={covered:.3f} s (wall {t1 - t0:.3f} -> driver gaps "
            f"~{t1 - t0 - covered:.3f} s incl. pre-warm jobs)"
        )
    except Exception as e:  # REST probe is best-effort
        print(f"[silver_profile] job attribution unavailable: {e}")

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
