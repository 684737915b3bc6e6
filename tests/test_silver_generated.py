"""Generated columns (Delta GENERATED ALWAYS AS parity): a merge batch
that omits the column gets it computed from the row's other columns; a
batch that provides it must match the expression null-safely or the
rows ride the merge's on_violation disposition.  Validation folds into
the same one-pass CHECK evaluation as real constraints — no extra scan.

Reference parity: the reference materializes derived fields at write
time in its encode step (main/src/etl.rs:1143-1180, object -> document
projection); generated columns are the declarative analog.
"""

from __future__ import annotations

import pytest

from huracan_spark.pipeline.silver import ConstraintViolation, SilverTable

SCHEMA = "_id string, version_ long, deleted boolean, val long"
SCHEMA_G = SCHEMA + ", val2 long"


def _mk(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_omitted_generated_column_is_computed(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(_mk(spark, [("a", 1, False, 10), ("b", 1, False, 7)]))
    got = {r._id: r.val2 for r in t.read().collect()}
    assert got == {"a": 20, "b": 14}
    # the generated column is part of the committed schema
    assert "val2" in t.read().columns


def test_provided_matching_values_pass_and_mismatch_fails(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(_mk(spark, [("a", 1, False, 10, 20)], SCHEMA_G))
    with pytest.raises(ConstraintViolation):
        t.merge(_mk(spark, [("b", 1, False, 7, 99)], SCHEMA_G))
    assert {r._id for r in t.read().collect()} == {"a"}


def test_null_mismatch_does_not_slip_through_check_loophole(spark, tmp_path):
    """SQL CHECK passes NULL; the generated-column match uses <=> so a
    provided NULL against a non-null expression still violates."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    with pytest.raises(ConstraintViolation):
        t.merge(_mk(spark, [("a", 1, False, 10, None)], SCHEMA_G))


def test_quarantine_disposition_applies_to_generated(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(
        _mk(
            spark,
            [("a", 1, False, 10, 20), ("b", 1, False, 7, 99)],
            SCHEMA_G,
        ),
        on_violation="quarantine",
    )
    assert {r._id for r in t.read().collect()} == {"a"}
    q = t.read_quarantine()
    assert [(r._id, list(r._violated)) for r in q.collect()] == [
        ("b", ["_generated_val2"])
    ]


def test_drop_generated_column_stops_enforcement(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.drop_generated_column("val2")
    t.merge(_mk(spark, [("a", 1, False, 10, 99)], SCHEMA_G))
    assert [r.val2 for r in t.read().collect()] == [99]


def test_clone_carries_generated_and_check_config(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.add_check("pos", "val > 0")
    t.merge(_mk(spark, [("a", 1, False, 10)]))
    c = t.clone(str(tmp_path / "c"))
    assert c.generated_columns() == {"val2": "val * 2"}
    assert c.constraints() == {"pos": "val > 0"}
    c.merge(_mk(spark, [("b", 2, False, 5)]))
    assert {r._id: r.val2 for r in c.read().collect()} == {"a": 20, "b": 10}
    with pytest.raises(ConstraintViolation):
        c.merge(_mk(spark, [("c", 1, False, -1)]))


def test_generated_column_through_dml_and_compact(spark, tmp_path):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(_mk(spark, [("a", 1, False, 10), ("b", 1, False, 3)]))
    # generated columns not explicitly assigned recompute from the
    # updated row (Delta UPDATE behavior)
    t.update_where([("_id", "=", "a")], {"val": "val + 1"})
    t.compact()
    got = {r._id: (r.val, r.val2) for r in t.read().collect()}
    assert got == {"a": (11, 22), "b": (3, 6)}


def test_replay_quarantine_on_generated_column_table(spark, tmp_path):
    """Replay must re-validate generated columns with the same
    synthetic <=> checks merge uses: a quarantined mismatch row stays
    quarantined (no ConstraintViolation blow-up from the inner merge),
    and re-admits once the generated column is dropped."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(
        _mk(
            spark,
            [("a", 1, False, 10, 20), ("b", 1, False, 7, 99)],
            SCHEMA_G,
        ),
        on_violation="quarantine",
    )
    assert t.read_quarantine().count() == 1
    # still mismatching: replay is a clean no-op, not a crash
    assert t.replay_quarantine() == 0
    q = t.read_quarantine()
    assert [(r._id, list(r._violated)) for r in q.collect()] == [
        ("b", ["_generated_val2"])
    ]
    # relaxing the generated contract re-admits the row as provided
    t.drop_generated_column("val2")
    assert t.replay_quarantine() == 1
    assert t.read_quarantine() is None
    got = {r._id: r.val2 for r in t.read().collect()}
    assert got == {"a": 20, "b": 99}


def test_rename_and_drop_refuse_generated_columns(spark, tmp_path):
    """Rename/drop of a generated column (or of an expression input)
    must refuse: a stale _GENERATED entry would silently re-add the old
    logical name on the next merge, and a renamed input breaks every
    subsequent merge with AnalysisException."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.add_generated_column("val2", "val * 2")
    t.merge(_mk(spark, [("a", 1, False, 10)]))
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("val2", "doubled")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("val2")
    # expression inputs are protected too
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("val", "amount")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("val")
    # dropping the generated contract unblocks the ALTER
    t.drop_generated_column("val2")
    t.rename_column("val2", "doubled")
    assert "doubled" in t.read().columns


def test_update_where_refuses_unknown_assignment_columns(spark, tmp_path):
    """Delta UPDATE refuses unknown columns — silently dropping a
    typo'd assignment would report n updated keys with no effect."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(_mk(spark, [("a", 1, False, 10)]))
    with pytest.raises(ValueError, match="unknown columns.*vall"):
        t.update_where([("_id", "=", "a")], {"vall": "val + 1"})
    # table unchanged
    assert [(r.version_, r.val) for r in t.read().collect()] == [(1, 10)]


def test_update_where_rhs_sees_the_old_row(spark, tmp_path):
    """Standard SQL UPDATE: assignment order must not matter — every
    right-hand side evaluates against the pre-update row."""
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        spark.createDataFrame(
            [("a", 1, False, 10, 100)],
            "_id string, version_ long, deleted boolean, x long, y long",
        )
    )
    t.update_where([("_id", "=", "a")], {"x": "y", "y": "x"})
    got = t.read().collect()[0]
    assert (got.x, got.y) == (100, 10)
