"""Data skipping (footer-stats file pruning) and CHECK constraints on
SilverTable — the Delta stats-pruning and invariant/expectation
surfaces over plain parquet manifests."""

from __future__ import annotations

import json
import os
import time

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huracan_spark.pipeline.silver import ConstraintViolation, SilverTable

SCHEMA = "_id string, version_ long, deleted boolean, type_ string, val long"


def _rows(spark, items):
    return spark.createDataFrame(items, SCHEMA)


def _seed(spark, path, n=40, n_buckets=8):
    t = SilverTable(spark, path, n_buckets=n_buckets)
    t.merge(
        _rows(
            spark,
            [
                (f"k{i:03d}", i, False, f"t{i % 4}", 100 + i)
                for i in range(n)
            ],
        )
    )
    return t


# -- data skipping -----------------------------------------------------


def test_read_where_prunes_buckets_and_matches_full_scan(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    filters = [("version_", ">=", 39)]
    kept, skipped = t.prune_plan(filters)
    assert skipped, "a selective range predicate should prune some buckets"
    assert kept, "the bucket holding version 39 must survive"
    pruned = t.read_where(filters)
    full = t.read().filter(F.col("version_") >= 39)
    assert sorted(r._id for r in pruned.collect()) == sorted(
        r._id for r in full.collect()
    )
    # the pruned plan opens strictly fewer files than the full scan
    assert len(set(pruned.inputFiles())) < len(set(t.read().inputFiles()))


def test_read_where_equality_on_string_column(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    # two disjoint type populations in disjoint key ranges
    t.merge(
        _rows(
            spark,
            [(f"a{i}", i, False, "alpha", i) for i in range(10)]
            + [(f"b{i}", i, False, "beta", i) for i in range(10)],
        )
    )
    got = {r._id for r in t.read_where([("type_", "=", "alpha")]).collect()}
    want = {f"a{i}" for i in range(10)}
    assert got == want


def test_read_where_empty_result_when_everything_prunes(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    df = t.read_where([("version_", ">", 10_000)])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        f.name for f in t.read().schema.fields
    ]


def test_merge_maintains_stats_incrementally(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    gen1 = t.current_generation()
    stats1 = t.bucket_stats(gen1)
    assert stats1 and all("version_" in s for s in stats1.values())
    time.sleep(0.002)
    # touch exactly one key
    t.merge(_rows(spark, [("k000", 9_999, False, "t0", 1)]))
    gen2 = t.current_generation()
    stats2 = t.bucket_stats(gen2)
    changed = t.changed_buckets(gen1, gen2)
    assert len(changed) == 1
    (b,) = changed
    assert stats2[b]["version_"]["max"] == 9_999
    for other in stats1:
        if other != b:
            assert stats2[other] == stats1[other], (
                "untouched buckets must carry their previous stats verbatim"
            )
    # the new state is now reachable by a stats-pruned incremental read
    fresh = t.read_where([("version_", ">", 5_000)])
    assert [r._id for r in fresh.collect()] == ["k000"]


def test_all_null_column_bucket_prunes(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=1)
    t.merge(
        spark.createDataFrame(
            [("a", 1, False, None)],
            "_id string, version_ long, deleted boolean, val long",
        )
    )
    kept, skipped = t.prune_plan([("val", ">", 0)])
    assert skipped == ["0"] and kept == []
    assert t.read_where([("val", ">", 0)]).count() == 0


def test_pre_stats_generation_reads_unpruned_but_correct(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    gen = t.current_generation()
    mf_path = os.path.join(t.path, gen, "manifest.json")
    with open(mf_path) as f:
        mf = json.load(f)
    del mf["stats"]
    del mf["fstats"]
    with open(mf_path, "w") as f:
        json.dump(mf, f)
    filters = [("version_", ">=", 39)]
    kept, skipped = t.prune_plan(filters)
    assert skipped == [], "no stats -> nothing may prune"
    assert t.read_where(filters).count() == 1


def test_compact_restore_clone_carry_stats(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    time.sleep(0.002)
    t.compact()
    assert t.bucket_stats(), "OPTIMIZE must re-harvest stats"
    _, skipped = t.prune_plan([("version_", ">=", 39)])
    assert skipped
    gen_compact = t.current_generation()
    time.sleep(0.002)
    t.restore(gen_compact)
    assert t.bucket_stats() == t.bucket_stats(gen_compact)
    clone = t.clone(str(tmp_path / "c"))
    assert clone.bucket_stats() == t.bucket_stats(gen_compact)
    _, skipped_clone = clone.prune_plan([("version_", ">=", 39)])
    assert skipped_clone == skipped


def test_clustered_compact_enables_file_level_pruning(spark, tmp_path):
    """OPTIMIZE with cluster_by sorts each bucket's rows so the files
    it splits into hold disjoint ranges — read_where then prunes at
    FILE granularity inside surviving buckets."""
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    t.merge(
        _rows(
            spark,
            [(f"k{i:03d}", i, False, "t", i) for i in range(200)],
        )
    )
    time.sleep(0.002)
    t.compact(max_records_per_file=25, cluster_by=["version_"])
    fstats = t.file_stats()
    assert fstats and all(len(files) > 1 for files in fstats.values()), (
        "each bucket must have split into several clustered files"
    )
    # files within a bucket hold disjoint, sorted version ranges
    for files in fstats.values():
        ranges = sorted(
            (s["version_"]["min"], s["version_"]["max"]) for s in files.values()
        )
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo
    filters = [("version_", ">=", 190)]
    kept, _ = t.prune_plan(filters)
    assert all(p.endswith(".parquet") for p in kept), "file-granular keep"
    total_files = sum(len(files) for files in fstats.values())
    assert len(kept) < total_files / 2, (
        f"a top-5% range read should open few files, got {len(kept)}/{total_files}"
    )
    pruned = t.read_where(filters)
    assert len(set(pruned.inputFiles())) == len(kept)
    assert sorted(r._id for r in pruned.collect()) == [
        f"k{i:03d}" for i in range(190, 200)
    ]


def test_merge_after_clustered_compact_keeps_file_stats_for_untouched(
    spark, tmp_path
):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    t.merge(_rows(spark, [(f"k{i:03d}", i, False, "t", i) for i in range(100)]))
    time.sleep(0.002)
    t.compact(max_records_per_file=20, cluster_by=["version_"])
    gen_c = t.current_generation()
    time.sleep(0.002)
    t.merge(_rows(spark, [("k000", 5_000, False, "t", 1)]))
    gen_m = t.current_generation()
    (touched_b,) = t.changed_buckets(gen_c, gen_m)
    f_c, f_m = t.file_stats(gen_c), t.file_stats(gen_m)
    for b in f_c:
        if b != touched_b:
            assert f_m[b] == f_c[b], "untouched buckets keep per-file stats"
    # the rewritten bucket's file stats describe the new file set
    assert f_m[touched_b] != f_c[touched_b]
    assert [r._id for r in t.read_where([("version_", ">", 4_000)]).collect()] == [
        "k000"
    ]


def test_vacuum_dry_run_and_detail_surfaces(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"), n=20, n_buckets=2)
    t.add_check("v_nonneg", "version_ >= 0")
    time.sleep(0.002)
    t.compact()
    time.sleep(0.002)
    t.compact()
    would = t.vacuum(keep=1, dry_run=True)
    assert would, "two compactions must leave a reclaimable generation"
    assert set(would) <= set(t.generations()), "dry run removes nothing"
    d = t.detail()
    assert d["stats_buckets"] == d["populated_buckets"] > 0
    assert d["file_stats_buckets"] == d["populated_buckets"]
    assert d["constraints"] == ["v_nonneg"]
    removed = t.vacuum(keep=1)
    assert removed == would


def test_timestamp_and_date_columns_prune(spark, tmp_path):
    """Temporal stats: the session writes INT64-micros timestamps (not
    statless INT96), footer stats normalize to epoch micros / date
    ordinals, and a time-range read prunes buckets outside it — the
    canonical incremental scan on an event table."""
    from datetime import date, datetime

    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    rows = [
        (f"k{i:02d}", 1, False, datetime(2024, 1, 1 + i // 4, 8 + i % 4), date(2024, 1, 1 + i))
        for i in range(12)
    ]
    t.merge(
        spark.createDataFrame(
            rows,
            "_id string, version_ long, deleted boolean, ts timestamp, d date",
        )
    )
    time.sleep(0.002)
    # cluster by time so the two buckets' files carry tight time ranges
    t.compact(max_records_per_file=3, cluster_by=["ts"])
    stats = t.bucket_stats()
    assert all(s["ts"]["kind"] == "ts" for s in stats.values())
    assert all(s["d"]["kind"] == "date" for s in stats.values())
    cutoff = datetime(2024, 1, 3)
    filters = [("ts", ">=", cutoff)]
    kept, _ = t.prune_plan(filters)
    total = sum(len(f) for f in t.file_stats().values())
    assert len(kept) < total, "a tail time-range read must skip files"
    got = sorted(r._id for r in t.read_where(filters).collect())
    want = sorted(r[0] for r in rows if r[3] >= cutoff)
    assert got == want
    # date-typed predicate prunes too and agrees with the full scan
    dgot = sorted(
        r._id for r in t.read_where([("d", "<", date(2024, 1, 4))]).collect()
    )
    assert dgot == sorted(r[0] for r in rows if r[4] < date(2024, 1, 4))


# -- skipping soundness property ---------------------------------------

_sk_rows = st.lists(
    st.tuples(
        st.integers(0, 20),                      # key index
        st.integers(1, 5),                       # version
        st.booleans(),                           # deleted
        st.integers(0, 3),                       # type index
        st.one_of(st.none(), st.integers(-50, 50)),  # val (nullable)
        st.booleans(),                           # second batch?
    ),
    min_size=1,
    max_size=30,
)

_sk_filters = st.lists(
    st.one_of(
        st.tuples(
            st.just("version_"),
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            st.integers(0, 6),
        ),
        st.tuples(
            st.just("type_"), st.sampled_from(["=", "!="]),
            st.sampled_from(["t0", "t1", "t2", "t9"]),
        ),
        st.tuples(
            st.just("val"), st.sampled_from(["<", ">", "="]),
            st.integers(-60, 60),
        ),
        st.tuples(
            st.just("_id"), st.just("in"),
            st.lists(
                st.integers(0, 22).map(lambda i: f"k{i:02d}"),
                min_size=1, max_size=3,
            ),
        ),
    ),
    min_size=1,
    max_size=3,
)


@given(
    rows=_sk_rows,
    filters=_sk_filters,
    clustered=st.booleans(),
    second_mor=st.booleans(),
    bloomed=st.booleans(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_read_where_equals_full_scan_property(
    spark, tmp_path_factory, rows, filters, clustered, second_mor, bloomed
):
    """PROPERTY: for ANY table content (null columns, tombstones,
    multi-batch merges — the second optionally merge-on-read — with or
    without bloom indexes, optionally a clustered OPTIMIZE) and ANY
    conjunction of supported predicates, the stats-pruned read returns
    EXACTLY the rows of the full-scan filter — pruning may only remove
    provably-dead IO, never rows."""
    from huracan_spark.pipeline.skipping import filters_to_column

    base = tmp_path_factory.mktemp("skprop")
    t = SilverTable(spark, str(base / "s"), n_buckets=4)
    if bloomed:
        t.add_bloom_index("type_", rebuild=False)
        t.add_bloom_index("_id", rebuild=False)
    batches = [
        [
            (f"k{k:02d}", v, dead, f"t{ty}", val)
            for k, v, dead, ty, val, second in rows
            if second == bi
        ]
        for bi in (False, True)
    ]
    for bi, b in enumerate(batches):
        if b:
            t.merge(
                spark.createDataFrame(b, SCHEMA),
                write_mode="mor" if (second_mor and bi == 1) else "cow",
            )
            time.sleep(0.002)
    if t.current_generation() is None:
        return
    if clustered:
        t.compact(max_records_per_file=3, cluster_by=["version_"])
    got = sorted(map(tuple, t.read_where(filters).collect()))
    want = sorted(
        map(tuple, t.read().filter(filters_to_column(filters)).collect())
    )
    assert got == want, (rows, filters, clustered, second_mor, bloomed)


# -- change feed over a commit range -----------------------------------


def test_table_changes_spans_generations(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    t.merge(_rows(spark, [("a", 1, False, "t", 1), ("b", 1, False, "t", 1)]))
    g1 = t.current_generation()
    time.sleep(0.002)
    t.merge(_rows(spark, [("a", 2, False, "t", 2)]))
    g2 = t.current_generation()
    time.sleep(0.002)
    t.merge(_rows(spark, [("b", 2, True, "t", 1)]))
    g3 = t.current_generation()

    tc = t.table_changes()
    rows = {(r._id, r.change_type, r._commit_generation) for r in tc.collect()}
    assert rows == {("a", "update", g2), ("b", "delete", g3)}
    assert all(r._commit_ts_ms > 0 for r in tc.collect())
    # range bounds behave like Delta's (start, end]
    assert {
        (r._id, r.change_type)
        for r in t.table_changes(start_gen=g2).collect()
    } == {("b", "delete")}
    assert {
        (r._id, r.change_type)
        for r in t.table_changes(end_gen=g2).collect()
    } == {("a", "update")}
    assert t.table_changes(start_gen=g3) is None
    with pytest.raises(ValueError):
        t.table_changes(start_gen="gen-bogus")
    # inserts become visible when the range starts BEFORE first commit:
    # g1 has no predecessor on disk, so the feed begins at g1 -> g2
    assert g1 == t.generations()[0]


# -- DML: DELETE / UPDATE ----------------------------------------------


def test_delete_where_tombstones_matching_live_rows(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))  # 40 rows, types t0..t3
    gen_before = t.current_generation()
    time.sleep(0.002)
    n = t.delete_where([("type_", "=", "t1")])
    assert n == 10
    state = t.read()
    live_types = {r.type_ for r in state.filter(~F.col("deleted")).collect()}
    assert "t1" not in live_types and live_types == {"t0", "t2", "t3"}
    # tombstones exist at version+1 (delete is final, time-travelable)
    tombs = {r._id: r.version_ for r in state.filter(F.col("deleted")).collect()}
    assert len(tombs) == 10
    assert all(v == int(k[1:]) + 1 for k, v in tombs.items())
    old = t.read(generation=gen_before)
    assert old.filter(F.col("deleted")).count() == 0
    # re-running the same DELETE matches no live row: idempotent
    assert t.delete_where([("type_", "=", "t1")]) == 0


def test_update_where_rewrites_at_next_version(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "s"))
    time.sleep(0.002)
    n = t.update_where([("type_", "=", "t2")], {"val": "val + 1000"})
    assert n == 10
    updated = t.read().filter(F.col("type_") == "t2").collect()
    assert all(r.val == 1100 + int(r._id[1:]) for r in updated)
    assert all(r.version_ == int(r._id[1:]) + 1 for r in updated)
    # untouched rows keep their original version and value
    rest = t.read().filter(F.col("type_") == "t3").collect()
    assert all(r.val == 100 + int(r._id[1:]) for r in rest)
    assert all(r.version_ == int(r._id[1:]) for r in rest)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.update_where([("type_", "=", "t2")], {"version_": "0"})


# -- CHECK constraints -------------------------------------------------


def test_check_constraint_fail_mode_raises_with_counts(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    t.add_check("version_nonneg", "version_ >= 0")
    t.add_check("typed", "type_ IS NOT NULL")
    bad = _rows(
        spark,
        [("a", -1, False, "t0", 1), ("b", 2, False, None, 1), ("c", -3, False, None, 1)],
    )
    with pytest.raises(ConstraintViolation) as ei:
        t.merge(bad)
    assert ei.value.counts == {"version_nonneg": 2, "typed": 2}
    assert t.read() is None, "a failed merge must not commit anything"


def test_check_constraint_null_passes_like_sql(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    t.add_check("val_positive", "val > 0")
    # val NULL -> expression UNKNOWN -> passes (SQL CHECK semantics)
    t.merge(_rows(spark, [("a", 1, False, "t0", None)]))
    assert t.read().count() == 1


def test_check_constraint_drop_and_quarantine_modes(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    t.add_check("version_nonneg", "version_ >= 0")
    t.merge(
        _rows(spark, [("a", 1, False, "t", 1), ("bad1", -1, False, "t", 1)]),
        on_violation="drop",
    )
    assert {r._id for r in t.read().collect()} == {"a"}
    t.merge(
        _rows(spark, [("b", 2, False, "t", 1), ("bad2", -2, False, "t", 1)]),
        on_violation="quarantine",
    )
    assert {r._id for r in t.read().collect()} == {"a", "b"}
    q = t.read_quarantine()
    assert q is not None
    qr = {r._id: r for r in q.collect()}
    assert set(qr) == {"bad2"}
    assert qr["bad2"]._violated == ["version_nonneg"]
    assert qr["bad2"]._quarantined_ts_ms > 0


def test_constraints_persist_across_table_handles(spark, tmp_path):
    path = str(tmp_path / "s")
    t = SilverTable(spark, path, n_buckets=4)
    t.add_check("version_nonneg", "version_ >= 0")
    reopened = SilverTable(spark, path)
    assert reopened.constraints() == {"version_nonneg": "version_ >= 0"}
    with pytest.raises(ConstraintViolation):
        reopened.merge(_rows(spark, [("a", -1, False, "t", 1)]))
    reopened.drop_check("version_nonneg")
    assert SilverTable(spark, path).constraints() == {}
    reopened.merge(_rows(spark, [("a", -1, False, "t", 1)]))
    assert reopened.read().count() == 1


def test_replay_quarantine_readmits_passing_rows(spark, tmp_path):
    """The sink-edge replay loop: after a constraint is dropped, rows
    it quarantined re-admit through the normal versioned MERGE; rows
    still failing OTHER constraints stay quarantined."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_check("pos", "val > 0")
    t.add_check("small", "val < 100")
    rows = spark.createDataFrame(
        [
            ("ok", 1, False, 5),
            ("neg", 1, False, -1),     # fails pos
            ("huge", 1, False, 500),   # fails small
        ],
        "_id string, version_ long, deleted boolean, val long",
    )
    t.merge(rows, on_violation="quarantine")
    assert {r._id for r in t.read().collect()} == {"ok"}
    assert t.read_quarantine().count() == 2
    # nothing passes yet: replay is a no-op
    assert t.replay_quarantine() == 0
    assert t.read_quarantine().count() == 2
    # relax one constraint: only its victims re-admit
    t.drop_check("pos")
    assert t.replay_quarantine() == 1
    got = {r._id: r.val for r in t.read().collect()}
    assert got == {"ok": 5, "neg": -1}
    q = t.read_quarantine()
    assert [(r._id, list(r._violated)) for r in q.collect()] == [
        ("huge", ["small"])
    ]
    # idempotent
    assert t.replay_quarantine() == 0
    # relax the rest: quarantine drains completely
    t.drop_check("small")
    assert t.replay_quarantine() == 1
    assert t.read_quarantine() is None
    assert {r._id for r in t.read().collect()} == {"ok", "neg", "huge"}
