"""Golden + property tests for the huracan domain pipeline.

The golden oracle is FIXTURES.md §4: silver state == DuckDB arg_max
reconstruction of object_changes ⨝ objects_content (max version per
id among kept changes; tombstone when the max-version change is a
deletion)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from huracan_spark.pipeline.backfill import apply_checkpoint_bounds, run_backfill
from huracan_spark.pipeline.fixtures import FixtureConfig, generate
from huracan_spark.pipeline.ingest import (
    build_silver_batch,
    enrich,
    parse_changes,
    reconcile_duplicates,
)
from huracan_spark.pipeline.silver import SilverTable


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("huracan-fixtures")
    generate(str(d), FixtureConfig(seed=42, n_objects=800, n_checkpoints=150))
    return str(d)


@pytest.fixture(scope="module")
def fx(spark, fixture_dir):
    return {
        "changes": spark.read.parquet(f"{fixture_dir}/object_changes.parquet"),
        "content": spark.read.parquet(f"{fixture_dir}/objects_content.parquet"),
        "completed": spark.read.parquet(f"{fixture_dir}/completed_checkpoints.parquet"),
        "dir": fixture_dir,
    }


# The golden reconstruction, written against the *raw fixtures* in
# DuckDB — deliberately an independent formulation (window, not the
# pipeline's aggregate path).
_GOLDEN_SQL = """
WITH kept AS (
  SELECT DISTINCT cp, change_type, object_id, version,
         change_type = 'deleted' AS deletion
  FROM read_parquet('{d}/object_changes.parquet')
  WHERE change_type IN ('created','mutated','deleted')
), enriched AS (
  SELECT k.object_id, k.version, k.deletion,
         c.object_type, c.owner_kind, c.owner_address,
         c.initial_shared_version, c.digest, c.previous_transaction,
         c.storage_rebate, c.fields_json, c.bcs_b64
  FROM kept k
  LEFT JOIN read_parquet('{d}/objects_content.parquet') c
    ON k.object_id = c.object_id AND k.version = c.version
  WHERE k.deletion OR (c.object_id IS NOT NULL AND c.rpc_error IS NULL)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY object_id ORDER BY version DESC) rn
  FROM enriched
)
SELECT object_id AS _id, version AS version_, deletion AS deleted,
       object_type, owner_kind, owner_address, initial_shared_version,
       digest, previous_transaction, storage_rebate, fields_json, bcs_b64
FROM ranked WHERE rn = 1
"""


def test_golden_silver_state(spark, fx):
    silver = SilverTable(spark, f"{fx['dir']}/silver_golden", n_buckets=8)
    run_backfill(spark, fx["changes"], fx["content"], silver)
    got = {
        r["_id"]: (r["version_"], r["deleted"], r["object_type"], r["fields_json"])
        for r in silver.read().collect()
    }
    exp_rows = duckdb.sql(_GOLDEN_SQL.format(d=fx["dir"])).fetchall()
    cols = [d[0] for d in duckdb.sql(_GOLDEN_SQL.format(d=fx["dir"])).description]
    i = {c: j for j, c in enumerate(cols)}
    exp = {
        r[i["_id"]]: (
            r[i["version_"]],
            r[i["deleted"]],
            r[i["object_type"]],
            r[i["fields_json"]],
        )
        for r in exp_rows
    }
    # DLQ'd objects (missing content at their max version) appear in
    # neither; tombstones appear in both with null payload.
    missing = {k for k in exp if k not in got}
    extra = {k for k in got if k not in exp}
    assert not missing, f"{len(missing)} objects missing from silver, e.g. {list(missing)[:3]}"
    assert not extra, f"{len(extra)} unexpected objects in silver, e.g. {list(extra)[:3]}"
    bad = [k for k in exp if got[k] != exp[k]]
    assert not bad, f"{len(bad)} mismatched states, e.g. {bad[:3]}: got {got[bad[0]]} exp {exp[bad[0]]}"


def test_replay_idempotent(spark, fx):
    """K1 contract: merging the same batch twice changes nothing."""
    silver = SilverTable(spark, f"{fx['dir']}/silver_idem", n_buckets=8)
    r1 = run_backfill(spark, fx["changes"], fx["content"], silver)
    state1 = sorted(map(tuple, silver.read().collect()))
    r2 = run_backfill(spark, fx["changes"], fx["content"], silver, collect_metrics=True)
    state2 = sorted(map(tuple, silver.read().collect()))
    assert state1 == state2
    # second pass: nothing inserted, nothing modified
    assert r2.merge_metrics.inserted == 0
    assert r2.merge_metrics.modified == 0


def test_split_replay_converges(spark, fx, tmp_path):
    """Order-independence: ingesting the stream in two arbitrary halves
    (split by hash) converges to the same state as one shot."""
    ch = fx["changes"]
    h = F.abs(F.hash("object_id", "version", "tx_digest")) % 2
    part1, part2 = ch.filter(h == 0), ch.filter(h == 1)

    s_once = SilverTable(spark, str(tmp_path / "once"), n_buckets=8)
    run_backfill(spark, ch, fx["content"], s_once)
    s_twice = SilverTable(spark, str(tmp_path / "twice"), n_buckets=8)
    run_backfill(spark, part2, fx["content"], s_twice)  # reversed order on purpose
    run_backfill(spark, part1, fx["content"], s_twice)
    a = sorted(map(tuple, s_once.read().collect()))
    b = sorted(map(tuple, s_twice.read().collect()))
    assert a == b


def test_parse_changes_triage(spark, fx):
    parsed = parse_changes(fx["changes"])
    kinds = {r.change_type for r in parsed.select("change_type").distinct().collect()}
    assert kinds == {"created", "mutated", "deleted"}
    n_raw = fx["changes"].count()
    n_kept = parsed.count()
    assert n_kept < n_raw  # noise rows were dropped


def test_reconcile_kills_cross_route_dups(spark, fx):
    parsed = parse_changes(fx["changes"])
    deduped = reconcile_duplicates(parsed)
    assert (
        deduped.groupBy("object_id", "version", "change_type").count().filter("count > 1").count()
        == 0
    )
    # first-sighting-wins: surviving ts_first_seen is the min per key
    mins = parsed.groupBy("object_id", "version", "change_type").agg(
        F.min("ts_first_seen").alias("ts_min")
    )
    j = deduped.join(mins, ["object_id", "version", "change_type"])
    assert j.filter(F.col("ts_first_seen") != F.col("ts_min")).count() == 0


def test_enrich_triage_and_dlq(spark, fx):
    parsed = reconcile_duplicates(parse_changes(fx["changes"]))
    res = enrich(parsed, fx["content"])
    # P4: every error kind that exists in content shows up in counts
    err_kinds = {r.rpc_error for r in res.errors.collect()}
    assert err_kinds <= {
        "deleted",
        "not_exists",
        "unknown",
        "display_error",
        "dynamic_field_not_found",
    }
    # K7: DLQ rows are live changes with no content row
    dlq_keys = {(r.object_id, r.version) for r in res.dlq.collect()}
    content_keys = {
        (r.object_id, r.version) for r in fx["content"].select("object_id", "version").collect()
    }
    assert dlq_keys and not (dlq_keys & content_keys)
    # P2: deletions pass through with null payload
    dels = res.enriched.filter(F.col("deletion"))
    assert dels.count() > 0
    assert dels.filter(F.col("object_type").isNotNull()).count() == 0


def test_whitelist_blacklist(spark, fx):
    from huracan_spark.pipeline.fixtures import TYPE_POOL

    parsed = reconcile_duplicates(parse_changes(fx["changes"]))
    target = TYPE_POOL[0]
    wl = enrich(parsed, fx["content"], whitelist=[target])
    types_wl = {
        r.object_type
        for r in wl.enriched.filter(~F.col("deletion")).select("object_type").distinct().collect()
    }
    assert types_wl == {target}
    bl = enrich(parsed, fx["content"], blacklist=[target])
    types_bl = {
        r.object_type
        for r in bl.enriched.filter(~F.col("deletion")).select("object_type").distinct().collect()
    }
    assert target not in types_bl and len(types_bl) > 0


def test_checkpoint_bounds_skip_and_stop(spark, fx):
    bounded = apply_checkpoint_bounds(fx["changes"], fx["completed"])
    done = {r.checkpoint_id for r in fx["completed"].collect()}
    remaining_cps = {r.cp for r in bounded.select("cp").distinct().collect()}
    assert not (remaining_cps & done)
    # stop marker at cp=2: nothing at or below survives
    assert min(remaining_cps) > 2


def test_completion_excludes_dlq_checkpoints(spark, fx, tmp_path):
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    res = run_backfill(spark, fx["changes"], fx["content"], silver)
    done = {r.checkpoint_id for r in res.completed_checkpoints.collect()}
    dlq_cps = {r.cp for r in res.dlq.select("cp").distinct().collect()}
    assert done and not (done & dlq_cps)
    assert res.max_cp_completed == max(done)


def test_dlq_jsonl_roundtrip_and_replay(spark, fx, tmp_path):
    """K7 wire format: DLQ rows survive a JSONL round-trip exactly, and
    replaying them through the retry consumer converges the silver
    table (idempotent by K1 — replaying twice changes nothing)."""
    from huracan_spark.pipeline.silver import SilverTable
    from huracan_spark.sources.dlq import read_dlq, replay_dlq, write_dlq

    changes = fx["changes"].limit(200)
    dlq_dir = str(tmp_path / "dlq_jsonl")
    write_dlq(changes, dlq_dir)
    back = read_dlq(spark, dlq_dir)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, changes.collect()))

    silver = SilverTable(spark, str(tmp_path / "dlq_silver"), n_buckets=4)
    n1 = replay_dlq(spark, dlq_dir, fx["content"], silver)
    assert n1 == 200
    state1 = sorted(map(tuple, silver.read().collect()))
    # replay again: at-least-once delivery must not change the state
    n2 = replay_dlq(spark, dlq_dir, fx["content"], silver)
    assert n2 == 200
    assert sorted(map(tuple, silver.read().collect())) == state1


def test_dlq_poison_line_surfaces_as_null(spark, tmp_path):
    from huracan_spark.sources.dlq import read_dlq

    d = str(tmp_path / "poison")
    import os

    os.makedirs(d)
    with open(os.path.join(d, "part-0.txt"), "w") as f:
        f.write('{"cp": 1, "tx_digest": "t", "change_type": "created", '
                '"object_id": "a", "version": 2, "ts_sui": 1, '
                '"ts_first_seen": 2, "ingested_via": "poll"}\n')
        f.write("this is not json\n")
    df = read_dlq(spark, d)
    assert df.count() == 2
    assert df.filter("object_id IS NULL").count() == 1  # triage-able


def test_completion_includes_all_triage_dropped_checkpoints(spark, fx, tmp_path):
    """K6 (etl.rs:529-567): the reference acks every scanned item,
    including triage-dropped ones — a checkpoint containing ONLY
    wrapped/transferred changes must land in the completed table, or
    apply_checkpoint_bounds rescans it on every backfill run."""
    from huracan_spark.schemas import OBJECT_CHANGE_SCHEMA

    dropped_only = spark.createDataFrame(
        [
            (999_999, "txw", "wrapped", "0xdead", 1, 1000, 2000, "livescan"),
            (999_999, "txt", "transferred", "0xbeef", 2, 1000, 2000, "livescan"),
        ],
        OBJECT_CHANGE_SCHEMA,
    )
    changes = fx["changes"].unionByName(dropped_only)
    silver = SilverTable(spark, str(tmp_path / "silver-dropped"), n_buckets=4)
    res = run_backfill(spark, changes, fx["content"], silver)
    done = {r.checkpoint_id for r in res.completed_checkpoints.collect()}
    assert 999_999 in done
    # and the dropped changes never reached silver
    assert silver.read().filter(F.col("_id").isin("0xdead", "0xbeef")).count() == 0
