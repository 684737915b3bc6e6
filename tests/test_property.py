"""Property-based tests (SURVEY §5.3): random permutations and
duplications of the change stream must yield identical silver state
(K1 idempotence + M3 dedup), and the islands operator must match a
brute-force range compression for arbitrary id sets.

Example counts are small: every example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from huracan_spark.operators.compaction import latest_state
from huracan_spark.operators.islands import descending_ranges


def _spark():
    from huracan_spark.session import get_spark

    return get_spark("property-tests")


_change = st.tuples(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.integers(min_value=0, max_value=9),
    st.booleans(),
)


def _latest_brute(rows):
    """Brute-force reference: per id, the row with max version wins;
    ties broken deterministically (deleted=True wins a tie, matching
    max_by on the (version, deleted) struct)."""
    best = {}
    for oid, version, deleted in rows:
        cur = best.get(oid)
        if cur is None or (version, deleted) > (cur[1], cur[2]):
            best[oid] = (oid, version, deleted)
    return sorted(best.values())


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(_change, min_size=1, max_size=25),
    dup_seed=st.randoms(use_true_random=False),
)
def test_latest_state_permutation_and_duplication_invariant(rows, dup_seed):
    spark = _spark()
    # adversarial delivery: duplicate a random subset, then shuffle
    noisy = rows + [r for r in rows if dup_seed.random() < 0.5]
    dup_seed.shuffle(noisy)
    df = spark.createDataFrame(
        [(oid, v, d) for oid, v, d in noisy], ["id", "version", "deleted"]
    )
    got = sorted(
        (r.id, r.version, r.deleted)
        for r in latest_state(df, "id", ("version", "deleted")).collect()
    )
    assert got == _latest_brute(rows)


def _ranges_brute(ids):
    out = []
    for i in sorted(set(ids)):
        if out and out[-1][1] == i - 1:
            out[-1][1] = i
        else:
            out.append([i, i])
    return sorted(
        ((hi, lo) for lo, hi in out), reverse=True
    )  # (end, start) desc, reference format


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40))
def test_descending_ranges_matches_bruteforce(ids):
    spark = _spark()
    df = spark.createDataFrame([(i,) for i in ids], ["checkpoint_id"])
    got = [(r.range_end, r.range_start) for r in descending_ranges(df).collect()]
    assert got == _ranges_brute(ids)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=120),
    n_parts=st.integers(min_value=1, max_value=9),
)
def test_global_cumsum_matches_bruteforce(vals, n_parts):
    """Distributed prefix sum == sequential prefix sum, for any values
    (incl. negatives) and any initial partitioning."""
    from huracan_spark.operators.prefix_sum import global_cumsum

    spark = _spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    ).repartition(n_parts)
    got = {
        r.k: r.c for r in global_cumsum(df, "v", "k", out_col="c").collect()
    }
    run, want = 0, {}
    for i, v in enumerate(vals):
        run += v
        want[i] = run
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fact=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
def test_salted_join_transparent_vs_plain_join(fact, n_salts):
    """salted_join == plain inner equi-join for any fact skew and any
    salt count (including heavy duplication of one key)."""
    from huracan_spark.operators.salting import salted_join

    spark = _spark()
    f = spark.createDataFrame(
        [(k, m) for k, m in fact], "k long, mix long"
    )
    d = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(6)], "k long, label string"
    )
    got = sorted(
        (r.k, r.mix, r.label)
        for r in salted_join(f, d, key="k", n_salts=n_salts, mix_cols=["mix"]).collect()
    )
    want = sorted((r.k, r.mix, r.label) for r in f.join(d, "k").collect())
    assert got == want
