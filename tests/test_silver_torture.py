"""Cross-feature model-based torture of the silver lakehouse stack.

Each per-feature hypothesis property (MOR convergence, cow/dv delete
equivalence, widening lattice, split-invariant streaming) models ONE
feature against its golden; this test drives RANDOM SEQUENCES of the
whole DML/layout surface — cow/mor merges, cow/mor/dv DELETEs,
UPDATEs, a column rename, re-bucketing OPTIMIZE, RESTORE to any
earlier commit, vacuum — and checks the on-disk table against a pure
python model after EVERY op, plus time travel to a random snapshot
and a final clone.  Cross-feature interaction bugs (a DV overlay
surviving a restore, a rename mistranslating a later delete's filter,
a MOR layer resurrected by compaction after restore, ...) have nowhere
to hide from the state equality.

Golden semantics (the documented MERGE total order, compaction.py):
strictly-higher (version, tombstone) wins; at equal versions a
tombstone beats a live arrival and stored state wins otherwise.
DELETE/UPDATE image matching live rows at version+1 (payload kept on
DELETE); UPDATE right-hand sides see the old row.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from huracan_spark.pipeline.silver import SilverTable

_OP = st.one_of(
    st.tuples(
        # mode "cow:int" merges the batch with an INT payload column:
        # the committed bigint schema must widen/promote transparently
        # (type-widening interplay with every other feature)
        st.sampled_from(["cow", "mor", "cow:int", "mor:int"]),
        st.lists(
            st.tuples(
            st.integers(min_value=0, max_value=4),  # key
            st.integers(min_value=1, max_value=4),  # version
            st.booleans(),  # tombstone
            st.integers(min_value=0, max_value=99),  # payload
            ),
            min_size=1,
            max_size=4,
        ),
    ).map(lambda t: ("merge", t[0], t[1])),
    st.tuples(
        st.just("delete"),
        st.sampled_from(["cow", "mor", "dv"]),
        st.integers(min_value=0, max_value=100),  # threshold: val < T
    ),
    st.tuples(
        st.just("update"),
        st.sampled_from(["cow", "mor"]),
        st.integers(min_value=0, max_value=100),  # threshold: val >= T
    ),
    st.tuples(st.just("rename"), st.just(None), st.just(None)),
    st.tuples(
        st.just("compact"), st.sampled_from([2, 4]), st.just(None)
    ),
    st.tuples(st.just("restore"), st.just(None), st.just(None)),
    st.tuples(st.just("vacuum"), st.just(None), st.just(None)),
)


def _golden_merge(model, batch):
    # in-batch pre-reduce: per key, max (version, tombstone)
    best = {}
    for k, v, dead, x in batch:
        cur = best.get(k)
        if cur is None or (v, dead) > (cur[0], cur[1]):
            best[k] = (v, dead, None if dead else x)
    for k, (v, dead, x) in best.items():
        cur = model.get(k)
        if cur is None:
            model[k] = (v, dead, x)
            continue
        sv, sd, _ = cur
        if v > sv or (v == sv and dead and not sd):
            model[k] = (v, dead, x)


def _golden_delete(model, thresh):
    for k, (v, dead, x) in list(model.items()):
        if not dead and x is not None and x < thresh:
            model[k] = (v + 1, True, x)  # payload kept (K2 image)


def _golden_update(model, thresh):
    for k, (v, dead, x) in list(model.items()):
        if not dead and x is not None and x >= thresh:
            model[k] = (v + 1, False, x + 10)


@settings(
    deadline=None,
    max_examples=5,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(_OP, min_size=3, max_size=7),
    restore_pick=st.integers(min_value=0, max_value=1000),
)
def test_silver_lakehouse_torture(spark, tmp_path_factory, ops, restore_pick):
    root = tmp_path_factory.mktemp("torture")
    t = SilverTable(spark, str(root / "t"), n_buckets=2)
    model: dict = {}  # key -> (version, deleted, payload or None)
    col = "val"  # current logical payload column name
    # (generation, frozen model, payload column name) after each commit
    snapshots: list = []

    def check():
        if t.current_generation() is None:
            assert model == {}
            return
        rows = t.read().collect()
        got = {
            r._id: (r.version_, r.deleted, getattr(r, col))
            for r in rows
        }
        want = {f"k{k}": (v, d, x) for k, (v, d, x) in model.items()}
        assert got == want
        assert (t.count_rows() or 0) == len(model)

    for op, arg, payload in ops:
        if op == "merge":
            # one row per (key, version): equal-version duplicates with
            # different payloads have no defined in-batch winner
            batch = list(
                {(k, v): (k, v, d, x) for (k, v, d, x) in payload}.values()
            )
            mode, _, narrow = arg.partition(":")
            dtype = "int" if narrow else "long"
            df = spark.createDataFrame(
                [(f"k{k}", v, d, None if d else x) for (k, v, d, x) in batch],
                f"_id string, version_ long, deleted boolean, {col} {dtype}",
            )
            t.merge(df, write_mode=mode)
            _golden_merge(model, batch)
        elif op == "delete":
            if not model:
                continue
            mode, thresh = arg, payload
            n = t.delete_where([(col, "<", thresh)], write_mode=mode)
            want_n = sum(
                1
                for (v, d, x) in model.values()
                if not d and x is not None and x < thresh
            )
            assert n == want_n, (mode, n, want_n)
            _golden_delete(model, thresh)
        elif op == "update":
            if not model:
                continue
            mode, thresh = arg, payload
            n = t.update_where(
                [(col, ">=", thresh)], {col: f"{col} + 10"}, write_mode=mode
            )
            want_n = sum(
                1
                for (v, d, x) in model.values()
                if not d and x is not None and x >= thresh
            )
            assert n == want_n
            _golden_update(model, thresh)
        elif op == "rename":
            if t.current_generation() is None:
                continue
            new = "amount" if col == "val" else "val"
            t.rename_column(col, new)
            col = new
        elif op == "compact":
            if t.current_generation() is None:
                continue
            t.compact(n_buckets=arg)
        elif op == "restore":
            if not snapshots:
                continue
            gen, snap, snap_col = snapshots[restore_pick % len(snapshots)]
            t.restore(gen)
            model = dict(snap)
            col = snap_col
        elif op == "vacuum":
            import os

            t.vacuum(keep=2)
            # vacuum legitimately retires old snapshots: restore/time
            # travel to them is a documented refusal, not a bug
            snapshots = [
                s
                for s in snapshots
                if os.path.isfile(
                    os.path.join(t.path, s[0], "manifest.json")
                )
            ]
        if t.current_generation() is not None:
            snapshots.append((t.current_generation(), dict(model), col))
        check()

    # time travel: every snapshot is still readable AND correct under
    # the column names of ITS OWN generation
    if snapshots:
        gen, snap, snap_col = snapshots[restore_pick % len(snapshots)]
        got = {
            r._id: (r.version_, r.deleted, getattr(r, snap_col))
            for r in t.read(gen).collect()
        }
        assert got == {
            f"k{k}": (v, d, x) for k, (v, d, x) in snap.items()
        }
    # a clone is the same table elsewhere
    if t.current_generation() is not None and model:
        c = t.clone(str(root / "c"))
        got = {
            r._id: (r.version_, r.deleted, getattr(r, col))
            for r in c.read().collect()
        }
        assert got == {f"k{k}": (v, d, x) for k, (v, d, x) in model.items()}
