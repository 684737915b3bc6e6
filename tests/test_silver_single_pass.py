"""Single-pass merge contract: a merge that never reads stored state
(MOR in any table state, or the first COW merge into an empty table)
must not run the touched-bucket pre-scan — the batch streams straight
into the partitioned write and the touched buckets are derived from
the written dirs.  At 100 TB the pre-scan is a full extra pass over
the batch; these tests pin that it stays gone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.classic.dataframe import DataFrame

from huracan_spark.pipeline.silver import SilverTable

SCHEMA = "_id string, version_ long, deleted boolean, val long"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _count_collects(monkeypatch):
    calls = []
    orig = DataFrame.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    return calls


def test_fresh_cow_merge_runs_no_prescan_collect(
    spark, tmp_path, monkeypatch
):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=4)
    calls = _count_collects(monkeypatch)
    t.merge(_mk(spark, [(f"k{i}", 1, False, i) for i in range(8)]))
    assert not calls, "first merge into an empty table ran a pre-scan"
    assert t.read().count() == 8
    # touched buckets derived from the written dirs match the manifest
    raw = t._manifest_raw(t.current_generation())
    gen_dir = os.path.join(t.path, t.current_generation())
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(gen_dir)
        if d.startswith("_bucket=")
    }
    assert set(raw["buckets"]) == dirs


def test_mor_merge_runs_no_prescan_collect(spark, tmp_path, monkeypatch):
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_mk(spark, [(f"k{i}", 1, False, i) for i in range(8)]))
    calls = _count_collects(monkeypatch)
    t.merge(
        _mk(spark, [("k0", 2, False, 100), ("new", 1, False, 7)]),
        write_mode="mor",
    )
    assert not calls, "MOR merge ran a pre-scan it never needs"
    got = {
        r.val
        for r in t.read().filter(F.col("_id").isin("k0", "new")).collect()
    }
    assert got == {100, 7}


def test_cow_merge_with_state_still_prescans_once(
    spark, tmp_path, monkeypatch
):
    # the guard in the other direction: an incremental COW merge must
    # keep the pre-scan (it bounds the state read to touched buckets)
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_mk(spark, [(f"k{i}", 1, False, i) for i in range(8)]))
    calls = _count_collects(monkeypatch)
    t.merge(_mk(spark, [("k0", 2, False, 100)]))
    assert len(calls) == 1
    assert t.read().filter(F.col("_id") == "k0").first().val == 100


def test_single_pass_empty_batch_commits_nothing(spark, tmp_path):
    # empty-batch MOR merge (idle streaming trigger): discovered
    # post-write in the single-pass path — no generation may be minted
    # and no claimed dir may linger
    t = SilverTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_mk(spark, [("k0", 1, False, 0)]))
    gen = t.current_generation()
    entries = set(os.listdir(t.path))
    t.merge(_mk(spark, []).limit(0), write_mode="mor")
    assert t.current_generation() == gen
    assert set(os.listdir(t.path)) == entries
