"""10x scale rehearsal: measure per-query scaling exponents.

Runs a fixed panel of the suite's heaviest queries (top floors in
BASELINE.md plus every shared-build group driver) at the sf0.1 fixture
AND at the synthesized 10x dataset (tools/make_scale10.py), then
reports per-query ratios and scaling exponents:

    exponent = log10(t_sf1 / t_sf0.1)        (1.0 == perfectly linear)

A query whose measured exponent is well above ~1.1 at this decade has
a hidden super-linear term that O()-shape reading missed.  Interpreting
caveats: sub-second sf0.1 floors carry fixed per-query overhead
(planning, JVM job launch ~0.1-0.3 s), so small queries UNDERSTATE
their data-term exponent at small t and the panel intentionally skews
to the heaviest queries; shared-build groups are measured by their
build cost (drained from matcost) rather than member read cost.

Prints one JSON line:
  {"metric": "huracan_spark_scale_rehearsal", "queries": {name:
   {"t_small": s, "t_big": s, "ratio": r, "exponent": e}}, "groups":
   {...}, "copies": 10}

Usage: python3 tools/scale_rehearsal.py [--repeat N] [names...]
Env: SPARK_GRAFT_SMALL (default /root/testdata/sf0.1),
     SPARK_GRAFT_BIG (default /root/repo/.scale/sf1),
     SPARK_GRAFT_INIT_PARTITIONS (deployment shuffle width — decade
     runs at sf10+ should set 512 on BOTH sides; see session.py)
"""

from __future__ import annotations

import json
import math
import os
import sys

# the 20 heaviest registered queries by BASELINE.md per-query floor,
# plus the shared-build group drivers (dedup CC pipeline, silver
# lifecycle drives, streaming staging) whose builds dominate `groups`
PANEL = [
    "embedding_lsh_near_dups",
    "related_parts_ppr",
    "ann_recall_trained",
    "ivf_search_trained",
    "brand_affinity_cosine",
    "pca_deflation_top2",
    "bfs_trade_hops",
    "doc_langid_margin",
    "pq_recall_eval",
    "triangle_count_nations",
    "brand_assoc_rules",
    "copurchase_pairs",
    "pq_adc_topk",
    "ann_filtered_search",
    "doc_char_entropy",
    "dup_span_report",
    "ann_recall_eval",
    "knn_label_accuracy",
    "pagerank_top_nodes",
    "corpus_clean",
    "semdedup_pairs",
    "semdedup_keep",
    # group drivers (their one-time builds land in `groups`)
    "dedup_clusters",
    "dedup_canonical",
    "minhash_lsh_candidates",
    "simhash_banded_near_dups",
    "shingle_containment_pairs",
    "stream_tumbling_totals",
    "silver_cdf_view",
    "silver_mor_state",
    "silver_dv_state",
    "silver_evolution_state",
    "dlq_replay_state",
]


def _run_panel(spark, sf_dir: str, names: list[str], repeat: int):
    # IDENTICAL methodology to bench.py, by construction: both call the
    # same benchlib loop, so exponents are comparable to the floors
    from huracan_spark.benchlib import measure_queries

    return measure_queries(spark, sf_dir, names, repeat=repeat, verbose=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        if i + 1 >= len(args) or not args[i + 1].isdigit():
            sys.exit("usage: scale_rehearsal.py [--repeat N] [--all] [names...]")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    run_all = "--all" in args
    if run_all:
        args.remove("--all")
    names = args or PANEL
    if run_all:
        from huracan_spark.queries.registry import REGISTRY, spark_queries

        spark_queries()
        names = sorted(REGISTRY)

    small = os.environ.get("SPARK_GRAFT_SMALL", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_BIG", "/root/repo/.scale/sf1")
    from huracan_spark.queries.registry import spark_queries
    from huracan_spark.session import get_spark

    spark_queries()
    spark = get_spark("huracan-scale-rehearsal")

    q_small, g_small = _run_panel(spark, small, names, repeat)
    q_big, g_big = _run_panel(spark, big, names, repeat)

    def _fold(a: dict, b: dict) -> dict:
        out = {}
        for k in a:
            ts, tb = a[k], b.get(k)
            if tb is None:
                continue
            ratio = round(tb / ts, 3) if ts > 0 else None
            exp = round(math.log10(tb / ts), 3) if ts and tb else None
            out[k] = {"t_small": ts, "t_big": tb, "ratio": ratio, "exponent": exp}
        return out

    print(json.dumps({
        "metric": "huracan_spark_scale_rehearsal",
        "unit": "sec",
        "copies": 10,
        "small": small,
        "big": big,
        "repeat": repeat,
        # deployment-scale shuffle width (session.py knob); decade
        # measurements run the SAME width on both sides so exponents
        # stay config-clean
        "init_partitions": os.environ.get("SPARK_GRAFT_INIT_PARTITIONS"),
        "queries": _fold(q_small, q_big),
        "groups": _fold(g_small, g_big),
    }))


if __name__ == "__main__":
    main()
