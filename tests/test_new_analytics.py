"""Property + plan tests for the round-4 analytics additions:
time-series (transition matrix, entropy, gap fill, EWMA, winsorized
mean), deterministic sketches (CMS, Bloom prefilter, vocab growth),
curation scores (DSIR, bigram LM, novelty), and triangle counting."""

from __future__ import annotations

import itertools

import pytest

from huracan_spark.queries.registry import REGISTRY, spark_queries

spark_queries()


def _run(spark, sf_dir, name: str):
    return REGISTRY[name].fn(spark, sf_dir)


def _plan(spark, sf_dir, name: str) -> str:
    return _run(spark, sf_dir, name)._jdf.queryExecution().executedPlan().toString()


# -- time-series -------------------------------------------------------------


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    rows = _run(spark, sf_dir, "event_transition_matrix").collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert total == pytest.approx(1.0, abs=1e-4), prev


def test_transition_matrix_window_is_partitioned_by_user(spark, sf_dir):
    p = _plan(spark, sf_dir, "event_transition_matrix")
    assert "Window" in p
    # the per-user lag window must never collapse to a single partition
    assert "SinglePartition" not in p.split("Window")[0]


def test_behavior_entropy_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "user_behavior_entropy").collect()
    assert rows
    import math

    for r in rows:
        assert 0.0 <= r.behavior_entropy <= math.log2(max(r.n_types, 2)) + 1e-9


def test_gap_fill_is_dense_and_carries_last_value(spark, sf_dir):
    rows = _run(spark, sf_dir, "gap_fill_daily").collect()
    types = {r.event_type for r in rows}
    days = {r.day_ms for r in rows}
    assert len(rows) == len(types) * len(days)  # dense spine
    # forward fill: wherever n > 0 the filled value is the day's own avg;
    # a gap day repeats the previous filled value
    for t in types:
        series = sorted((r for r in rows if r.event_type == t), key=lambda r: r.day_ms)
        prev = None
        for r in series:
            if r.n == 0:
                assert r.avg_value_filled == prev
            prev = r.avg_value_filled


def test_ewma_matches_pandas(spark, sf_dir):
    import pandas as pd

    from huracan_spark.queries.timeseries import EWMA_ALPHA
    from huracan_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {r.event_type: r.ewma for r in _run(spark, sf_dir, "ewma_daily_value").collect()}
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp")).alias(
                "day_ms"
            ),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .toPandas()
    )
    for t, g in daily.groupby("event_type"):
        series = g.sort_values("day_ms")["x"]
        want = series.ewm(alpha=EWMA_ALPHA, adjust=False).mean().iloc[-1]
        assert got[t] == pytest.approx(round(want, 4), abs=2e-4)


def test_winsorized_mean_within_clip_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "winsorized_mean_per_type").collect():
        assert r.p05 <= r.winsorized_mean <= r.p95


# -- sketches ----------------------------------------------------------------


def test_cms_estimate_is_one_sided(spark, sf_dir):
    rows = _run(spark, sf_dir, "cms_heavy_hitters").collect()
    assert rows
    for r in rows:
        assert r.est_n >= r.true_n  # CMS never underestimates
        assert r.overestimate == r.est_n - r.true_n


def test_cms_sketch_join_is_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "cms_heavy_hitters")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bloom_has_no_false_negatives(spark, sf_dir):
    rows = _run(spark, sf_dir, "bloom_prefilter_join").collect()
    assert rows
    for r in rows:
        assert r.n_pass_bloom >= r.n_actual  # a bloom cannot drop a match
        assert r.n_false_pos == r.n_pass_bloom - r.n_actual
        assert r.n_false_pos >= 0


def test_bloom_bits_join_is_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "bloom_prefilter_join")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_vocab_growth_is_monotone_and_concave_ish(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "vocab_growth_curve").collect(), key=lambda r: r.slice
    )
    assert [r.slice for r in rows] == list(range(len(rows)))
    for a, b in itertools.pairwise(rows):
        assert b.n_units_cum > a.n_units_cum
        assert b.n_vocab_cum >= a.n_vocab_cum  # vocab never shrinks
    # Heaps: vocabulary grows sublinearly vs token mass
    first, last = rows[0], rows[-1]
    assert last.n_vocab_cum / first.n_vocab_cum < last.n_units_cum / first.n_units_cum


# -- curation ----------------------------------------------------------------


def test_dsir_target_lang_scores_higher(spark, sf_dir):
    from huracan_spark.sources.tables import load_table

    docs = {r.doc_id: r.lang for r in load_table(spark, sf_dir, "documents").collect()}
    rows = _run(spark, sf_dir, "dsir_importance").collect()
    en = [r.dsir_weight for r in rows if docs[r.doc_id] == "en"]
    rest = [r.dsir_weight for r in rows if docs[r.doc_id] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_bigram_logprob_bounded_and_stats_broadcast(spark, sf_dir):
    rows = _run(spark, sf_dir, "bigram_logprob").collect()
    assert all(r.avg_logprob < 0 for r in rows)
    p = _plan(spark, sf_dir, "bigram_logprob")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ngram_novelty_fraction_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "ngram_novelty").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert 0.0 <= r.novelty <= 1.0


# -- triangles ---------------------------------------------------------------


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    """Degree-ordered orientation must count exactly the undirected
    triangles (checked against itertools over the kept edge set)."""
    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    und = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("x"),
            F.greatest("c_nationkey", "s_nationkey").alias("y"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    avg = sum(r.n for r in und) / len(und)
    edges = {(r.x, r.y) for r in und if r.n > avg}
    nodes = sorted({v for e in edges for v in e})
    per_node = dict.fromkeys(nodes, 0)
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for v in (a, b, c):
                per_node[v] += 1
    got = {
        r.n_name: r.n_triangles
        for r in _run(spark, sf_dir, "triangle_count_nations").collect()
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    want = {nation[k]: v for k, v in per_node.items() if v > 0}
    assert got == want


def test_triangle_join_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "triangle_count_nations")
    assert "CartesianProduct" not in p


# -- market basket / WAU / typo pairs ----------------------------------------


def test_copurchase_lift_consistent_with_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    rows = _run(spark, sf_dir, "copurchase_pairs").collect()
    assert rows and all(r.support >= 2 for r in rows)
    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = lp.select("l_orderkey").distinct().count()
    freq = {r.l_partkey: r.n for r in lp.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()}
    r = rows[0]
    want = round(r.support * n_orders / (freq[r.part_a] * freq[r.part_b]), 6)
    assert r.lift == pytest.approx(want, abs=1e-6)


def test_trailing_active_users_matches_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    au = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type", "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .distinct()
        .collect()
    )
    days = sorted({r.day for r in au})
    got = {
        (r.event_type, r.day_ms): r.n_active
        for r in _run(spark, sf_dir, "trailing_7d_active_users").collect()
    }
    # brute-force check on the latest day, per type
    import datetime

    last = days[-1]
    lo = last - datetime.timedelta(days=6)
    for et in {r.event_type for r in au}:
        want = len({r.user_id for r in au if r.event_type == et and lo <= r.day <= last})
        key = (et, int(last.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000))
        assert got[key] == want


def test_typo_pairs_complete_vs_bruteforce(spark, sf_dir):
    """FastSS candidate generation must find EVERY vocabulary pair
    within edit distance 2 (losslessness of the deletion-neighborhood
    blocking), verified against itertools over the full vocabulary."""
    from pyspark.sql import functions as F

    from huracan_spark.functions.textfns import tokens
    from huracan_spark.queries.curation import TYPO_MIN_LEN
    from huracan_spark.sources.tables import load_table

    vocab = [
        r.token
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .distinct()
        .collect()
        if len(r.token) >= TYPO_MIN_LEN
    ]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b): lev(a, b)
        for a, b in itertools.combinations(sorted(vocab), 2)
        if lev(a, b) <= 2
    }
    got = {
        (r.token_a, r.token_b): r.dist
        for r in _run(spark, sf_dir, "token_typo_pairs").collect()
    }
    assert got == want


# -- z-order / BFS -----------------------------------------------------------


def test_zorder_key_matches_python_morton(spark):
    from pyspark.sql import functions as F

    from huracan_spark.operators.zorder import Z_BITS, zorder_key

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(Z_BITS):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (37, 201)]
    df = spark.createDataFrame(pairs, "a: long, b: long").select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == morton(r.a, r.b)


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """Every contiguous 2^10 z-range covers a 32x32 tile: both spans
    must be < 32 even though the global spans are far larger."""
    rows = _run(spark, sf_dir, "zorder_layout_stats").collect()
    assert rows
    for r in rows:
        assert r.u_span < 32 and r.d_span < 32


def test_bfs_hops_match_bruteforce(spark, sf_dir):
    from collections import deque

    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    und = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("x"),
            F.greatest("c_nationkey", "s_nationkey").alias("y"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    avg = sum(r.n for r in und) / len(und)
    adj: dict[int, set[int]] = {}
    for r in und:
        if r.n > avg:
            adj.setdefault(r.x, set()).add(r.y)
            adj.setdefault(r.y, set()).add(r.x)
    src = min(adj)
    want = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    nation = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    got = {r.n_name: r.hops for r in _run(spark, sf_dir, "bfs_trade_hops").collect()}
    # BFS_ROUNDS covers the diameter of the fixture graph
    assert got == {nation[k]: v for k, v in want.items()}


# -- correlation / skew / weighted reservoir ---------------------------------


def test_correlation_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "value_hour_correlation").collect():
        assert -1.0 <= r.corr_value_hour <= 1.0


def test_key_skew_gini_bounds(spark, sf_dir):
    r = _run(spark, sf_dir, "key_skew_report").collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert 0.0 < r.top1_share <= 1.0
    assert r.max_key_rows <= r.n_rows


def test_weighted_reservoir_favors_heavy_docs(spark, sf_dir):
    """E-S sampling with w = n_chars must bias the sample toward longer
    docs: sampled mean length > corpus mean length."""
    from pyspark.sql import functions as F

    from huracan_spark.queries.llmprep import ES_SAMPLE_K
    from huracan_spark.sources.tables import load_table

    rows = _run(spark, sf_dir, "weighted_reservoir_sample").collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert all(v == ES_SAMPLE_K for v in per_source.values())
    corpus_mean = (
        load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_decile_lift_is_complete_and_monotone(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "customer_decile_lift").collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # top deciles must hold more spend than bottom ones (gains property)
    assert rows[9].total_cents > rows[0].total_cents
    # cumulative-from-top is decreasing in decile order and ends at ~1
    assert rows[0].cum_share_from_top == pytest.approx(1.0, abs=1e-4)


def test_knn_label_accuracy_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "knn_label_accuracy").collect()
    assert rows
    from huracan_spark.queries.similarity import N_EVAL_QUERIES

    assert sum(r.n_queries for r in rows) == N_EVAL_QUERIES
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert 0.0 <= r.accuracy <= 1.0


def test_unresolved_errors_brute_force(spark, sf_dir):
    from huracan_spark.queries.relational import RESOLVE_WINDOW_US
    from huracan_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).collect()
    clicks: dict[int, list[int]] = {}
    for r in ev:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r.us)
    want: dict[int, list[int]] = {}
    for r in ev:
        if r.event_type == "error":
            res = any(
                r.us < c < r.us + RESOLVE_WINDOW_US
                for c in clicks.get(r.user_id, [])
            )
            e, u = want.setdefault(r.user_id, [0, 0]), None
            e[0] += 1
            e[1] += 0 if res else 1
    got = {
        r.user_id: [r.n_errors, r.n_unresolved]
        for r in _run(spark, sf_dir, "unresolved_errors").collect()
    }
    assert got == want


def test_inverted_index_postings_are_capped_prefixes(spark, sf_dir):
    from huracan_spark.queries.text import POSTINGS_CAP

    for r in _run(spark, sf_dir, "inverted_index_sample").collect():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, POSTINGS_CAP)


def test_keyset_pagination_pushes_cursor_into_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "pagination_keyset")
    assert "GreaterThan(event_id,1234)" in p  # cursor reached the scan
    assert "TakeOrderedAndProject" in p  # page sort never materializes fully


def test_keyset_pagination_walks_pages_without_overlap(spark, sf_dir):
    from huracan_spark.operators.pagination import paginate_after
    from huracan_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    cursor, seen = None, []
    for _ in range(3):
        page = paginate_after(ev, "event_id", limit=40, after=cursor).collect()
        ids = [r.event_id for r in page]
        assert ids == sorted(ids)
        seen.extend(ids)
        cursor = (ids[-1],)
    assert len(seen) == len(set(seen)) == 120  # disjoint consecutive pages
    assert seen == sorted(seen)


def test_three_step_funnel_bruteforce(spark, sf_dir):
    from huracan_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    want: dict[int, int] = {}
    last_click: dict[int, int] = {}
    last_view: dict[int, int] = {}
    for r in ev:
        if r.event_type == "purchase":
            c, v = last_click.get(r.user_id), last_view.get(r.user_id)
            if c is not None and v is not None and c < v:
                want[r.user_id] = want.get(r.user_id, 0) + 1
        elif r.event_type == "click":
            last_click[r.user_id] = r.us
        elif r.event_type == "view":
            last_view[r.user_id] = r.us
    got = {
        r.user_id: r.n_funnel_purchases
        for r in _run(spark, sf_dir, "three_step_funnel").collect()
    }
    assert got == want


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "benford_first_digit").collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    assert all(r.chi2_term >= 0 for r in rows)


def test_wilson_interval_brackets_rate(spark, sf_dir):
    r = _run(spark, sf_dir, "conversion_rate_ci").collect()[0]
    assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
    assert r.k <= r.n


def test_kmv_join_estimate_is_sane(spark, sf_dir):
    r = _run(spark, sf_dir, "kmv_join_estimate").collect()[0]
    assert 0 <= r.shared <= 64
    assert 0.0 <= r.jaccard_est <= 1.0
    assert r.exact_intersection >= 0
    # the sketch estimate should land within 50% of truth at k=64 on
    # the fixture's heavily-overlapping user sets
    if r.exact_intersection > 20:
        assert abs(r.intersection_est - r.exact_intersection) < 0.5 * r.exact_intersection


def test_conversion_latency_percentiles_ordered(spark, sf_dir):
    r = _run(spark, sf_dir, "conversion_latency_percentiles").collect()[0]
    assert r.n_conversions > 0
    assert 0 <= r.p50_s <= r.p90_s <= r.p99_s


# -- DQ / Holt / personalized PageRank ----------------------------------------


def test_dq_check_one_scan_and_correct_counts(spark, sf_dir):
    from huracan_spark.operators.dq import check, in_set, not_null, unique
    from huracan_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = {
        r.rule: r
        for r in check(
            ev, [not_null("user_id"), in_set("event_type", ["click"]), unique("event_id")]
        ).collect()
    }
    n = ev.count()
    n_click = ev.filter("event_type = 'click'").count()
    assert out["not_null(user_id)"].n_violations == 0
    assert out["not_null(user_id)"].passed
    assert out["in_set(event_type)"].n_violations == n - n_click
    assert out["unique(event_id)"].passed  # event_id is the PK


def test_holt_forecast_matches_python_fold(spark, sf_dir):
    from huracan_spark.queries.timeseries import HOLT_ALPHA, HOLT_BETA, HOLT_H
    from huracan_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp")).alias(
                "day_ms"
            ),
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .toPandas()
    )
    got = {r.event_type: r for r in _run(spark, sf_dir, "holt_forecast_daily").collect()}
    for t, g in daily.groupby("event_type"):
        xs = list(g.sort_values("day_ms")["x"])
        level, b = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            new_l = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + b)
            b = HOLT_BETA * (new_l - level) + (1 - HOLT_BETA) * b
            level = new_l
        assert got[t].level == pytest.approx(round(level, 4), abs=2e-4)
        assert got[t].trend == pytest.approx(round(b, 4), abs=2e-4)
        assert got[t][f"forecast_{HOLT_H}d"] == pytest.approx(
            round(level + HOLT_H * b, 4), abs=5e-4
        )


def test_personalized_pagerank_mass_decays_with_distance(spark):
    """Triangle a-b-c with tail c--d (non-bipartite, so finite power
    iteration doesn't oscillate): PPR from `a` must rank the far tail
    node `d` lowest, and conserve mass (no dangling nodes)."""
    from huracan_spark.operators.pagerank import personalized_pagerank

    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    reset = spark.createDataFrame([("a", 1.0)], "node string, reset double")
    ranks = {
        r.node: r.rank
        for r in personalized_pagerank(edges, reset, iterations=6).collect()
    }
    assert min(("a", "b", "c"), key=ranks.get) != "d"
    assert all(ranks[n] > ranks["d"] for n in ("a", "b", "c"))
    assert ranks["a"] == max(ranks.values())  # source keeps the most mass
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_ab_split_is_balanced_and_z_is_finite(spark, sf_dir):
    import math

    r = _run(spark, sf_dir, "ab_test_significance").collect()[0]
    assert r.na + r.nb > 0 and r.ka <= r.na and r.kb <= r.nb
    # hash split should be roughly balanced
    assert 0.25 < r.na / (r.na + r.nb) < 0.75
    assert math.isfinite(r.z_score)
    assert r.significant_95 == (abs(r.z_score) > 1.96)


def test_kaplan_meier_survival_is_monotone(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "kaplan_meier_weekly").collect(), key=lambda r: r.t)
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9  # survival never increases
        assert r.d <= r.n_at_risk
        prev = r.survival


def test_tfidf_keywords_top3_per_doc(spark, sf_dir):
    rows = _run(spark, sf_dir, "doc_tfidf_keywords").collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        assert len(rs) <= 3
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        assert all(r.tfidf > 0 for r in rs)


def test_langid_confusion_is_complete_and_valid(spark, sf_dir):
    """The fixture's text is English-ish word soup for every metadata
    lang (the lang column is generator metadata, not ground truth — see
    functions/textfns.py), so the matrix can't be diagonal; assert the
    structural contract instead: every doc lands in exactly one cell
    and predictions stay in the classifier's output alphabet."""
    from huracan_spark.functions.textfns import LANG_MARKERS
    from huracan_spark.sources.tables import load_table

    rows = _run(spark, sf_dir, "langid_confusion").collect()
    total = sum(r.n for r in rows)
    assert total == load_table(spark, sf_dir, "documents").count()
    allowed = set(LANG_MARKERS) | {"unknown"}
    assert {r.predicted_lang for r in rows} <= allowed
    assert all(r.n > 0 for r in rows)


def test_longest_streak_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    days = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(
                F.unix_millis(F.date_trunc("day", F.col("ts")).cast("timestamp"))
                / F.lit(86400000)
            ).alias("d"),
        )
        .distinct()
        .collect()
    )
    per_user: dict[int, set] = {}
    for r in days:
        per_user.setdefault(r.user_id, set()).add(r.d)
    want = {}
    for u, ds in per_user.items():
        best = cur = 1
        s = sorted(ds)
        for a, b in zip(s, s[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        want[u] = best
    got = {
        r.user_id: r.longest_streak_days
        for r in _run(spark, sf_dir, "longest_daily_streak").collect()
    }
    assert got == want


def test_neyman_sample_respects_quotas(spark, sf_dir):
    from pyspark.sql import functions as F

    from huracan_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = {
        r.source: (r.n, r.s)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.stddev_samp("n_chars").alias("s"))
        .collect()
    }
    mass = sum(n * s for n, s in stats.values())
    rows = _run(spark, sf_dir, "neyman_stratified_sample").collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    for src, cnt in per_source.items():
        n, s = stats[src]
        quota = max(1, round(100 * n * s / mass))
        assert cnt == min(quota, n)
