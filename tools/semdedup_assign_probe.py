"""SemDeDup ASSIGNMENT-only probe for extreme decades.

Measures the depth-4 centroid-tree walk (queries/similarity.py::
_semdedup_assigned) in isolation at a given sf dir — built for the
decade-4 fixture `.scale/emb_d4` (20M vectors, K = 80000, r = 10),
where running the full pairs/keep panel is pointless (the within-cell
quadratic is the published algorithm; what decade 4 stresses is the
ASSIGNMENT's shuffle-free projection pipeline).  The r7 attempt with
the pre-fix exploded walk was IO-bound on 3 x 10GB localCheckpoint
writes and never finished inside its timeout; the shuffle-free walk
has no corpus-sized materialization at all, so this probe is the
post-fix number the r7 VERDICT asked for.

Reports wall time to full materialization of (vec_id, centroid_id)
plus cell-balance stats (k_used, max cell, sum(cell^2) — the pair-work
proxy; ideal balanced sumsq is N*CELL).

Usage: python3 tools/semdedup_assign_probe.py [SF_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/emb_d4"
    from pyspark.sql import functions as F

    from huracan_spark.queries.similarity import (
        N_CENTROIDS,
        SEMDEDUP_CELL,
        _emb,
        _normalized,
        _semdedup_assigned,
    )
    from huracan_spark.session import get_spark

    spark = get_spark("semdedup-assign-probe")
    t0 = time.time()
    n = _normalized(_emb(spark, sf))
    # persist only the slim projection (16B/row): ONE materialization
    # of the walk; the balance aggs then read the cache, never re-walk
    slim = _semdedup_assigned(n).select("vec_id", "centroid_id").persist()
    n_vec = slim.count()
    wall = time.time() - t0
    cells = slim.groupBy("centroid_id").agg(F.count("*").alias("c"))
    bal = cells.agg(
        F.count("*").alias("k_used"),
        F.max("c").alias("max_cell"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq"),
    ).collect()[0]
    k = max(N_CENTROIDS, n_vec // SEMDEDUP_CELL)
    r = max(i for i in range(1, 301) if i**4 <= k // 8)
    print(
        json.dumps(
            {
                "metric": "semdedup_assign_probe",
                "sf_dir": sf,
                "n_vectors": n_vec,
                "k": k,
                "r": r,
                "k_used": bal.k_used,
                "max_cell": bal.max_cell,
                "sumsq": bal.sumsq,
                "sumsq_balanced_ideal": n_vec * SEMDEDUP_CELL,
                "assign_wall_sec": round(wall, 1),
            }
        )
    )
    slim.unpersist()


if __name__ == "__main__":
    main()
