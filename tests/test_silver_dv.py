"""Deletion vectors on SilverTable (Delta deletion-vector / Iceberg
position-delete parity): ``delete_where(write_mode="dv")`` commits a
metadata-only generation whose parquet sidecar lists (file, row
position) marks; reads overlay those positions as version+1 tombstones
via a BROADCAST join — no data file rewritten, no reconciliation
shuffle — and must stay bit-identical to the copy-on-write DELETE.

Reference parity: the reference deletes in place through its store
(main/src/etl.rs:1238-1247, delete is final); DV mode preserves that
contract at O(deleted rows) write IO.
"""

from __future__ import annotations

import time

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huracan_spark.pipeline.silver import SilverTable

SCHEMA = "_id string, version_ long, deleted boolean, val long"


def _rows(spark, items):
    return spark.createDataFrame(items, SCHEMA)


def _state(t):
    return sorted(
        (r._id, r.version_, r.deleted, r.val) for r in t.read().collect()
    )


def _seed(spark, t, n=16):
    t.merge(_rows(spark, [(f"k{i:02d}", 1, False, i) for i in range(n)]))


def test_dv_delete_is_bit_identical_to_cow_delete(spark, tmp_path):
    cow = SilverTable(spark, str(tmp_path / "cow"), n_buckets=4)
    dv = SilverTable(spark, str(tmp_path / "dv"), n_buckets=4)
    _seed(spark, cow), _seed(spark, dv)
    bases_before = dict(dv.manifest(dv.current_generation()))
    n_cow = cow.delete_where([("val", "<", 5)], write_mode="cow")
    n_dv = dv.delete_where([("val", "<", 5)], write_mode="dv")
    assert n_cow == n_dv == 5
    assert _state(cow) == _state(dv)
    # the DV commit rewrote NO data file — every base ref is untouched
    assert dict(dv.manifest(dv.current_generation())) == bases_before
    assert dv.dvs(), "deletion vectors recorded"
    assert dv.detail()["dv_buckets"] == len(dv.dvs())
    op = dv.history()[0]
    assert op["operation"] == "DELETE" and op["mode"] == "dv"
    assert op["deleted_keys"] == 5


def test_dv_redelete_is_idempotent_and_stacks(spark, tmp_path):
    cow = SilverTable(spark, str(tmp_path / "cow"), n_buckets=4)
    dv = SilverTable(spark, str(tmp_path / "dv"), n_buckets=4)
    _seed(spark, cow), _seed(spark, dv)
    assert dv.delete_where([("val", "<", 5)], write_mode="dv") == 5
    cow.delete_where([("val", "<", 5)], write_mode="cow")
    # same predicate again: every match is already tombstoned
    assert dv.delete_where([("val", "<", 5)], write_mode="dv") == 0
    # a second, overlapping DV stacks; the overlay is a distinct-union
    assert dv.delete_where([("val", "<", 8)], write_mode="dv") == 3
    cow.delete_where([("val", "<", 8)], write_mode="cow")
    assert _state(cow) == _state(dv)


def test_cow_merge_absorbs_only_touched_dvs(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=8)
    _seed(spark, t, n=32)
    t.delete_where([("val", "<", 6)], write_mode="dv")
    dv_buckets = set(t.dvs())
    assert len(dv_buckets) > 1
    # merge a higher version of one deleted key: its bucket's DV is
    # materialized away, the other buckets keep theirs
    t.merge(_rows(spark, [("k00", 3, False, 100)]))
    b_k00 = str(
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit("k00")), F.lit(8)).cast("int").alias("b")
        )
        .first()
        .b
    )
    assert b_k00 not in set(t.dvs())
    assert set(t.dvs()) == dv_buckets - {b_k00}
    got = {r._id: (r.version_, r.deleted) for r in t.read().collect()}
    assert got["k00"] == (3, False)
    # the other deleted keys are still tombstoned at version 2
    for k in ("k01", "k02", "k03", "k04", "k05"):
        if k != "k00":
            assert got[k] == (2, True), k


def test_mor_merge_stacks_above_dv(spark, tmp_path):
    cow = SilverTable(spark, str(tmp_path / "cow"), n_buckets=2)
    dv = SilverTable(spark, str(tmp_path / "dv"), n_buckets=2)
    _seed(spark, cow, 8), _seed(spark, dv, 8)
    cow.delete_where([("val", "<", 4)], write_mode="cow")
    dv.delete_where([("val", "<", 4)], write_mode="dv")
    # a live row above the tombstone version revives the key (K1 order)
    up = _rows(spark, [("k00", 5, False, 50), ("k07", 5, False, 70)])
    cow.merge(up, write_mode="mor")
    dv.merge(up, write_mode="mor")
    assert _state(cow) == _state(dv)
    # and a DV delete lands on a MOR'd bucket too (marks the delta file)
    assert cow.delete_where([("val", "=", 50)], write_mode="cow") == 1
    assert dv.delete_where([("val", "=", 50)], write_mode="dv") == 1
    assert _state(cow) == _state(dv)


def test_dv_read_plan_has_no_shuffle(spark, tmp_path):
    """The 100 TB contract: reading a DV'd copy-on-write bucket is a
    scan + broadcast overlay join — NO shuffle exchange, unlike
    merge-on-read reconciliation (which pays a latest_state reduce)."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t)
    t.delete_where([("val", "<", 4)], write_mode="dv")
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_read_where_version_filter_on_dv_bucket_is_sound(spark, tmp_path):
    """Footer stats describe PRE-overlay bytes: a filter on version_
    (or deleted) must not prune a DV'd bucket whose overlay moved rows
    past the stored max — the pruning trap specific to DVs."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=1)
    t.merge(_rows(spark, [("a", 1, False, 1), ("b", 1, False, 2)]))
    t.delete_where([("val", "=", 1)], write_mode="dv")
    # stored version_ max is 1; the overlay makes a's version 2
    got = t.read_where([("version_", ">=", 2)])
    assert [(r._id, r.version_, r.deleted) for r in got.collect()] == [
        ("a", 2, True)
    ]
    got2 = t.read_where([("deleted", "=", True)])
    assert [r._id for r in got2.collect()] == ["a"]
    # data-column stats still prune: impossible predicate reads nothing
    kept, skipped = t.prune_plan([("val", ">", 100)])
    assert kept == [] and skipped == ["0"]


def test_diff_and_table_changes_see_dv_commits(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(_rows(spark, [("a", 1, False, 1), ("b", 1, False, 2)]))
    g1 = t.current_generation()
    time.sleep(0.002)
    t.delete_where([("val", "=", 1)], write_mode="dv")
    g2 = t.current_generation()
    d = {r._id: r.change_type for r in t.diff(g1, g2).collect()}
    assert d == {"a": "delete"}
    tc = t.table_changes(g1, g2)
    assert [(r._id, r.change_type) for r in tc.collect()] == [
        ("a", "delete")
    ]


def test_cdf_stream_emits_dv_deletes(spark, tmp_path):
    from huracan_spark.sources.silver_cdf_source import (
        register_silver_cdf_source,
    )

    register_silver_cdf_source(spark)
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(_rows(spark, [("a", 1, False, 1), ("b", 1, False, 2)]))
    g1 = t.current_generation()
    t.delete_where([("val", "=", 1)], write_mode="dv")
    t.merge(_rows(spark, [("c", 1, False, 3)]), write_mode="mor")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("silver_cdf")
        .option("path", t.path)
        .option("starting", g1)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    feed = {
        r._id: (r._change_type, r.version_, r.deleted)
        for r in spark.read.parquet(out).collect()
    }
    assert feed == {
        "a": ("delete", 2, True),
        "c": ("insert", 1, False),
    }


def test_time_travel_and_restore_across_dv(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, 8)
    g_live = t.current_generation()
    live_state = _state(t)
    t.delete_where([("val", "<", 4)], write_mode="dv")
    g_dv = t.current_generation()
    deleted_state = _state(t)
    # the pre-delete generation still reads fully live
    assert sorted(
        (r._id, r.version_, r.deleted, r.val)
        for r in t.read(g_live).collect()
    ) == live_state
    # restore past the delete, then re-restore the DV generation
    t.restore(g_live)
    assert _state(t) == live_state
    t.restore(g_dv)
    assert _state(t) == deleted_state
    assert t.dvs() == t.dvs(g_dv)


def test_vacuum_clone_respect_dv_references(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, 8)
    t.delete_where([("val", "<", 3)], write_mode="dv")
    t.merge(_rows(spark, [("k07", 3, False, 70)]), write_mode="mor")
    want = _state(t)
    t.vacuum(keep=1)
    assert _state(t) == want
    c = t.clone(str(tmp_path / "c"))
    assert _state(c) == want
    assert c.dvs() == t.dvs()
    # clones are independent: compacting the source leaves the clone
    t.compact()
    assert t.dvs() == {}
    assert _state(c) == want


def test_dv_after_rename_column(spark, tmp_path):
    """DVs key by (file, position), not column names — a rename before
    or after the delete never invalidates them (column mapping)."""
    cow = SilverTable(spark, str(tmp_path / "cow"), n_buckets=2)
    dv = SilverTable(spark, str(tmp_path / "dv"), n_buckets=2)
    _seed(spark, cow, 8), _seed(spark, dv, 8)
    cow.rename_column("val", "amount")
    dv.rename_column("val", "amount")
    assert dv.delete_where([("amount", "<", 3)], write_mode="dv") == 3
    cow.delete_where([("amount", "<", 3)], write_mode="cow")
    assert sorted(map(tuple, cow.read().collect())) == sorted(
        map(tuple, dv.read().collect())
    )


@settings(
    deadline=None,
    max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # key
                st.integers(min_value=1, max_value=4),  # version
                st.booleans(),  # tombstone
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
    deletes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=4),
    modes=st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_cow_and_dv_deletes_converge_bit_identically(
    spark, tmp_path_factory, batches, deletes, modes
):
    """ANY interleaving of merges (cow or mor) and threshold deletes
    produces the same final state whether the deletes rewrite (cow) or
    record deletion vectors — including deletes whose matches span
    base, delta, and already-DV'd layers."""
    root = tmp_path_factory.mktemp("dvprop")
    cow = SilverTable(spark, str(root / "cow"), n_buckets=2)
    dv = SilverTable(spark, str(root / "dv"), n_buckets=2)
    for i, b in enumerate(batches):
        rows = _rows(
            spark,
            [
                (f"k{k}", v, d, None if d else 100 * i + k * 10 + v)
                for (k, v, d) in b
            ],
        )
        mode = "mor" if modes[i % len(modes)] else "cow"
        cow.merge(rows, write_mode=mode)
        dv.merge(rows, write_mode=mode)
        if i < len(deletes):
            flt = [("val", "<", deletes[i])]
            n1 = cow.delete_where(flt, write_mode="cow")
            n2 = dv.delete_where(flt, write_mode="dv")
            assert n1 == n2
    assert _state(cow) == _state(dv)


def test_concurrent_merge_and_dv_delete_serialize(spark, tmp_path):
    """The DV DELETE holds the commit lock across read-mark-commit
    (positions cannot rebase); a concurrent optimistic merge must
    retry around it and neither commit may be lost."""
    import threading

    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=4)
    _seed(spark, t, 12)
    spark.sparkContext.setLogLevel("ERROR")
    errs = []

    def _merge():
        try:
            h = SilverTable(spark, t.path, n_buckets=4)
            h.merge(
                _rows(spark, [(f"m{i}", 1, False, 100 + i) for i in range(4)])
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def _delete():
        try:
            h = SilverTable(spark, t.path, n_buckets=4)
            h.delete_where([("val", "<", 6)], write_mode="dv")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=_merge), threading.Thread(target=_delete)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    got = {r._id: (r.version_, r.deleted, r.val) for r in t.read().collect()}
    # every merged key present and live
    for i in range(4):
        assert got[f"m{i}"] == (1, False, 100 + i)
    # every originally-matching seeded key tombstoned at version 2
    for i in range(6):
        assert got[f"k{i:02d}"][1] is True, (i, got[f"k{i:02d}"])
    for i in range(6, 12):
        assert got[f"k{i:02d}"] == (1, False, i)
