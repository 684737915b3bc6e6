"""Bloom filter indexes on SilverTable (Delta bloom index analog):
point-lookup file skipping on high-cardinality NON-bucket columns,
where min/max footer stats cannot prune."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huracan_spark.pipeline import bloom
from huracan_spark.pipeline.silver import SilverTable

SCHEMA = "_id string, version_ long, deleted boolean, owner string, val long"


def _rows(spark, items):
    return spark.createDataFrame(items, SCHEMA)


def _seed(spark, path, n=60, n_buckets=8):
    """Each owner value appears in exactly one row, so the owners in
    any one bucket file are a small subset of the owner space — the
    setting where blooms prune and min/max spans cannot."""
    t = SilverTable(spark, path, n_buckets=n_buckets)
    t.merge(
        _rows(
            spark,
            [(f"k{i:03d}", 1, False, f"owner-{i:03d}", i) for i in range(n)],
        )
    )
    return t


def _collected(df):
    return sorted((r._id, r.version_, r.owner) for r in df.collect())


def test_positions_match_between_python_and_spark(spark):
    """The driver-side membership test and the JVM-side harvest MUST
    hash identically, for strings and for ints via the string cast."""
    values = ["owner-007", "", "héllo wörld", 42, -3, 123456789012345]
    df = spark.createDataFrame([(str(v), v if isinstance(v, int) else None) for v in values], "s string, i long")
    m, k = 1 << 10, 5
    jvm_rows = df.select(
        "s", F.array(*bloom.position_columns("s", m, k)).alias("p")
    ).collect()
    jvm = {r.s: list(r.p) for r in jvm_rows}
    for v in values:
        assert jvm[str(v)] == bloom.bit_positions(str(v), m, k)
    # int column hashed via CAST AS STRING == Python str()
    ints = df.filter(F.col("i").isNotNull()).select(
        "i", F.array(*bloom.position_columns("i", m, k)).alias("p")
    ).collect()
    for r in ints:
        assert list(r.p) == bloom.bit_positions(str(r.i), m, k)


def test_bloom_prunes_point_lookup_and_matches_full_scan(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    t.add_bloom_index("owner")  # rebuild=True indexes current data
    filters = [("owner", "=", "owner-017")]
    kept, _ = t.prune_plan(filters)
    # bucketing can't help (owner is not the bucket key) and every
    # bucket's [min,max] owner span covers the probe — only the bloom
    # can prove absence per file
    all_files = len(set(t.read().inputFiles()))
    assert len(kept) < all_files
    assert _collected(t.read_where(filters)) == _collected(
        t.read().filter(F.col("owner") == "owner-017")
    )


def test_absent_value_prunes_everything_but_stays_exact(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    t.add_bloom_index("owner")
    df = t.read_where([("owner", "=", "no-such-owner")])
    assert df.count() == 0
    # schema preserved on the everything-pruned path
    assert [f.name for f in df.schema.fields] == [
        f.name for f in t.read().schema.fields
    ]


def test_in_list_prunes_only_when_all_members_absent(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    t.add_bloom_index("owner")
    hit = t.read_where([("owner", "in", ["owner-001", "ghost"])])
    assert {r._id for r in hit.collect()} == {"k001"}
    miss = t.read_where([("owner", "in", ["ghost-a", "ghost-b"])])
    assert miss.count() == 0
    kept_miss, _ = t.prune_plan([("owner", "in", ["ghost-a", "ghost-b"])])
    assert kept_miss == []


def test_merge_maintains_blooms_incrementally(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    t.add_bloom_index("owner")
    before = t.file_blooms()
    t.merge(_rows(spark, [("k000", 2, False, "owner-new", 0)]))
    after = t.file_blooms()
    assert set(after), "blooms survive a merge"
    # untouched buckets carry their bitmaps verbatim
    carried = [b for b in after if after[b] == before.get(b)]
    assert carried, "some untouched bucket should carry its blooms"
    # the new value is findable, the superseded row is gone
    got = _collected(t.read_where([("owner", "=", "owner-new")]))
    assert got == [("k000", 2, "owner-new")]


def test_new_commits_index_without_rebuild(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    t.add_bloom_index("owner", rebuild=False)  # empty table: config only
    t.merge(
        _rows(spark, [(f"k{i}", 1, False, f"o-{i}", i) for i in range(12)])
    )
    assert t.file_blooms(), "commit after add_bloom_index harvests bitmaps"
    kept, _ = t.prune_plan([("owner", "=", "o-3")])
    assert len(kept) < len(set(t.read().inputFiles()))


def test_optimize_restore_clone_carry_blooms(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    t.add_bloom_index("owner")
    gen_indexed = t.current_generation()
    t.compact()
    assert t.file_blooms(), "OPTIMIZE re-harvests bitmaps for its files"
    assert _collected(t.read_where([("owner", "=", "owner-005")])) == [
        ("k005", 1, "owner-005")
    ]
    t.restore(gen_indexed)
    assert t.file_blooms() == t.file_blooms(gen_indexed)
    c = t.clone(str(tmp_path / "c"))
    assert c.file_blooms() == t.file_blooms()
    assert _collected(c.read_where([("owner", "=", "owner-005")])) == [
        ("k005", 1, "owner-005")
    ]


def test_all_null_files_get_zero_bitmaps_and_prune(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    t.merge(
        _rows(
            spark,
            [(f"k{i}", 1, False, None, i) for i in range(8)],
        )
    )
    t.add_bloom_index("owner")
    kept, _ = t.prune_plan([("owner", "=", "anything")])
    assert kept == [], "all-null files provably contain no value"
    assert t.read_where([("owner", "=", "anything")]).count() == 0


def test_untestable_values_never_bloom_prune(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"), n=10, n_buckets=2)
    t.add_bloom_index("val")
    # float probe on an int column: Python str(3.0) != Spark "3" — the
    # bloom must decline rather than mis-prune; result stays exact
    got = t.read_where([("val", "=", 3.0)])
    assert {r._id for r in got.collect()} == {"k003"}


def test_drop_bloom_index_stops_future_harvest(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"), n=10, n_buckets=2)
    t.add_bloom_index("owner")
    t.drop_bloom_index("owner")
    t.compact()  # rewrites everything with no configured indexes
    assert t.file_blooms() in ({}, None) or not any(
        t.file_blooms().values()
    )


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    owners=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=25
    ),
    probe=st.integers(min_value=0, max_value=40),
    data=st.data(),
)
def test_bloom_soundness_property(spark, tmp_path_factory, owners, probe, data):
    """ANY content x ANY probe (present or absent) x optional second
    merge: the bloom-pruned read equals the full-scan filter."""
    path = str(tmp_path_factory.mktemp("bloomprop"))
    t = SilverTable(spark, path, n_buckets=4)
    t.add_bloom_index("owner", rebuild=False)
    rows = [
        (f"k{i}", 1, False, f"o-{v}", i) for i, v in enumerate(owners)
    ]
    t.merge(_rows(spark, rows))
    if data.draw(st.booleans()):
        extra = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=1,
                max_size=5,
            )
        )
        t.merge(
            _rows(
                spark,
                [
                    (f"x{i}", 1, False, f"o-{v}", i)
                    for i, v in enumerate(extra)
                ],
            )
        )
    want = _collected(t.read().filter(F.col("owner") == f"o-{probe}"))
    got = _collected(t.read_where([("owner", "=", f"o-{probe}")]))
    assert got == want


def test_bloom_rebuild_on_mor_table_keeps_deltas(spark, tmp_path):
    """add_bloom_index(rebuild=True) on a table with merge-on-read
    layers must carry the deltas key through its metadata-only commit
    (regression: dropping it made the delta layers invisible)."""
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    t.merge(_rows(spark, [("a", 1, False, "o-a", 1), ("b", 1, False, "o-b", 2)]))
    t.merge(
        _rows(spark, [("a", 2, False, "o-a2", 10)]), write_mode="mor"
    )
    before = sorted(
        (r._id, r.version_, r.owner) for r in t.read().collect()
    )
    t.add_bloom_index("owner")  # rebuild commit on a MOR table
    assert t.deltas(), "delta layers must survive the bloom rebuild"
    after = sorted(
        (r._id, r.version_, r.owner) for r in t.read().collect()
    )
    assert after == before
    assert ("a", 2, "o-a2") in after
