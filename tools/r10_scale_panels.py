"""Round-10 changed-query scale panels.

Re-measures, with the shared benchlib methodology (repeat-2 minima,
noop sink, group attribution), the queries whose PLANS changed in the
round-10 optimization pass, on the decades where the canonical record
(SCALE_REHEARSAL_r09.json) carries rows for them:

- d1 (sf0.1 -> sf1): the 16 changed queries in the r9 d1 panel
- d2/d3 (sf1 -> sf10 -> sf100): corpus_clean (quality_gates staging)
  and dup_span_report (plan unchanged — A/B'd and kept; measured for
  the attribution record)

Usage: python3 -m tools.r10_scale_panels d1|d23 [sf_dir ...]
Width convention follows r9: d3 measured with
SPARK_GRAFT_INIT_PARTITIONS=512 on both sides (set by the caller);
d1/d2 at default width — so the d23 panel is invoked TWICE: once for
the d2 legs (sf1 sf10, default width) and once for the d3 legs
(sf10 sf100, width 512).  One JSON line per (decade, sf_dir) with the
per-query seconds and group builds.
"""

from __future__ import annotations

import json
import sys

D1_QUERIES = [
    "ann_recall_trained", "bfs_trade_hops", "brand_affinity_cosine",
    "brand_assoc_rules", "copurchase_pairs", "corpus_clean",
    "doc_langid_margin", "dup_span_report", "ivf_search_trained",
    "knn_label_accuracy", "pagerank_top_nodes", "pca_deflation_top2",
    "pq_adc_topk", "pq_recall_eval", "related_parts_ppr",
    "triangle_count_nations",
]
D23_QUERIES = ["corpus_clean", "dup_span_report"]


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "d1"
    from huracan_spark.queries.registry import spark_queries
    from huracan_spark.session import get_spark
    from huracan_spark.benchlib import measure_queries

    spark_queries()
    spark = get_spark(f"r10-scale-{which}")
    if which == "d1":
        names, sf_dirs = D1_QUERIES, ["/root/testdata/sf0.1", "/root/repo/.scale/sf1"]
    elif which == "d23":
        names, sf_dirs = D23_QUERIES, [
            "/root/repo/.scale/sf1",
            "/root/repo/.scale/sf10",
            "/root/repo/.scale/sf100",
        ]
    else:
        raise SystemExit(f"unknown panel {which}")
    if len(sys.argv) > 2:
        sf_dirs = sys.argv[2:]
    for sf_dir in sf_dirs:
        pq, groups = measure_queries(spark, sf_dir, names, repeat=2)
        print(
            json.dumps(
                {"panel": which, "sf_dir": sf_dir, "queries": pq,
                 "groups": groups}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
