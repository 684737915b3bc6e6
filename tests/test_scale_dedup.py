"""Scale-path pair generators: lossless/bounded guarantees.

VERDICT r2 items 4-6: the three quadratic-inside-blocking-key pair
generators get scale-safe twins.  These tests pin the properties that
make them safe at 100 TB:

- simhash banding is LOSSLESS (pigeonhole): banded pairs == all-pairs
- the Jaccard df cap BOUNDS hot-shingle join fan-out
- embedding LSH banding generates a SUBSET of the true near pairs
  (linear candidates, measured recall) and its plan has no
  nested-loop/cartesian join
"""

from __future__ import annotations

from pyspark.sql import functions as F

from huracan_spark.queries.registry import REGISTRY, spark_queries


def _plan(spark, sf_dir, name: str) -> str:
    spark_queries()
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_simhash_banding_lossless(spark, sf_dir):
    """Pigeonhole guarantee: hamming <= 6 over 7 segments => at least
    one identical segment, so banding loses NO pair vs all-pairs."""
    spark_queries()
    banded = sorted(
        map(tuple, REGISTRY["simhash_banded_near_dups"].fn(spark, sf_dir).collect())
    )
    allpairs = sorted(
        map(tuple, REGISTRY["simhash_near_dups"].fn(spark, sf_dir).collect())
    )
    assert banded == allpairs
    assert len(banded) > 0  # non-vacuous


def test_jaccard_df_cap_bounds_hot_shingle(spark):
    """One shingle shared by k docs must not contribute k^2 join rows:
    over-cap shingles are dropped before the self-join."""
    from huracan_spark.queries.dedup import jaccard_pairs

    rows = [(f"d{i}", "s", "hot hot") for i in range(40)]
    # two docs sharing 3 rare shingles (plus one rare each -> J = 3/5)
    for d in ("a", "b"):
        rows += [(d, "s", f"rare {j}") for j in range(3)] + [(d, "s", f"only {d}")]
    sh = spark.createDataFrame(rows, "doc_id string, source string, shingle string")

    capped = jaccard_pairs(sh, df_cap=10)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    # the 40-doc hot clique vanished; only the rare-shingle pair remains
    assert got == {("a", "b"): 0.6}

    # without the cap the hot shingle manufactures the full clique
    uncapped = jaccard_pairs(sh, df_cap=10_000)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_embedding_lsh_pairs_subset_with_recall(spark, sf_dir):
    """Banded candidates are a subset of the true near pairs (banding
    only MISSES, never invents — cosine is verified exactly), with
    non-trivial recall on the fixture corpus."""
    from huracan_spark.queries.dedup import _docs  # noqa: F401 (parallel import path)
    from huracan_spark.queries.similarity import (
        NEAR_DUP_COS,
        _dot,
        _emb,
        _normalized,
    )

    spark_queries()
    banded = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["embedding_lsh_near_dups"].fn(spark, sf_dir).collect()
    }
    # exact all-pairs ground truth (no label blocking), fine at sf0.001
    n = _normalized(_emb(spark, sf_dir)).persist()
    a, b = n.alias("a"), n.alias("b")
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(_dot(F.col("a.nemb"), F.col("b.nemb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
        .collect()
    }
    assert banded <= exact
    assert len(exact) > 0
    recall = len(banded) / len(exact)
    # 2 bands x 6 planes on near-orthogonal synthetic vectors: banding
    # must retain a meaningful share of true pairs
    assert recall >= 0.3, f"recall collapsed: {recall:.2f} ({len(banded)}/{len(exact)})"


def test_scale_pair_generators_plan_no_nested_loop(spark, sf_dir):
    """The whole point of banding: candidate joins are equi-joins a
    hash partitioner can plan — never BroadcastNestedLoop/cartesian."""
    for name in ("simhash_banded_near_dups", "embedding_lsh_near_dups"):
        p = _plan(spark, sf_dir, name)
        assert "NestedLoop" not in p and "Cartesian" not in p, name


# -- connected components (dedup clustering) --------------------------------


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (worst-case diameter) plus a 2-clique plus the
    propagation must label every node with its component min."""
    from huracan_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 20)],
        "src long, dst long",
    )
    got = {r.node: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_string_ids(spark):
    """String node ids: hashed-sum convergence check path."""
    from huracan_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = {r.node: r.label for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_raises_on_iteration_cap(spark):
    from huracan_spark.operators.connected_components import connected_components
    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=1)


def test_dedup_canonical_keeps_longest(spark, sf_dir):
    """Every kept doc must have max n_chars within its cluster (min
    doc_id among equals), and clusters partition the pair graph."""
    from huracan_spark.queries.registry import REGISTRY, spark_queries

    spark_queries()
    kept = REGISTRY["dedup_canonical"].fn(spark, sf_dir).collect()
    clusters = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_clusters"].fn(spark, sf_dir).collect()
    }
    assert len(kept) == len(set(clusters.values()))  # one rep per cluster
    assert sum(r.n_members for r in kept) == len(clusters)
    for r in kept:
        assert clusters[r.kept_doc] == r.cluster_id


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check: CC labels must equal a pure-Python union-find
    reference on a batch of deterministic pseudo-random graphs."""
    import random

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    from huracan_spark.operators.connected_components import connected_components

    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = {
            r.node: r.label
            for r in connected_components(
                spark.createDataFrame(edges, "src long, dst long")
            ).collect()
        }
        assert got == uf_components(edges), f"trial {trial}"


def test_lsh_band_width_is_the_scale_knob(spark):
    """The 100 TB LSH claim, measured: at a dup-grade threshold, wider
    bands keep candidate volume selective (buckets ~ n / 2^w) while
    recall on TRUE near-dups stays high — the fixture's narrow 2x6
    config floods candidates on the same corpus.  Corpus: 60 planted
    near-dup pairs (cosine ~0.98) inside 600 background vectors."""
    import random

    from huracan_spark.queries.similarity import DIM, lsh_candidate_pairs

    rng = random.Random(0x5CA1E)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    rows, truth = [], set()
    vid = 0
    for _ in range(300):
        rows.append((vid, unit()))
        vid += 1
    for _ in range(60):  # planted dup pairs: tiny perturbation
        base = unit()
        dup = [x + rng.gauss(0, 0.02) for x in base]
        rows.append((vid, base))
        rows.append((vid + 1, dup))
        truth.add((vid, vid + 1))
        vid += 2
    for _ in range(180):
        rows.append((vid, unit()))
        vid += 1
    e = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )

    def stats(n_bands, w):
        cand = {
            (r.vec_a, r.vec_b)
            for r in lsh_candidate_pairs(e, n_bands, w).collect()
        }
        recall = len(cand & truth) / len(truth)
        return len(cand), recall

    n = len(rows)
    all_pairs = n * (n - 1) // 2
    narrow_cand, narrow_recall = stats(2, 6)
    wide_cand, wide_recall = stats(2, 12)
    # dup-grade pairs agree per plane with p ~ 1 - theta/pi ~ 0.96:
    # even 12-bit bands keep them
    assert wide_recall >= 0.9, f"wide-band recall {wide_recall}"
    assert narrow_recall >= 0.9
    # the knob: widening bands by 6 bits cuts candidate volume by an
    # order of magnitude on the same corpus; narrow bands are dense
    assert wide_cand < narrow_cand / 8, (wide_cand, narrow_cand)
    assert wide_cand < all_pairs / 50, "wide bands must be selective"
