"""Config loader, metrics table, latency stats, silver time travel."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from huracan_spark.config import EngineConfig, load_config
from huracan_spark.pipeline.fixtures import FixtureConfig, generate
from huracan_spark.pipeline.metrics import MetricsTable, latency_stats
from huracan_spark.pipeline.silver import SilverTable


def test_config_defaults_match_reference():
    cfg = load_config(env={})
    assert cfg.backfill_threshold == 3  # main/config.yaml:11
    assert cfg.poll_interval_ms == 100  # main/config.yaml:17
    assert cfg.rpc_batch_size == 50  # main/config.yaml:41


def test_config_yaml_plus_env_overlay(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text("backfill_threshold: 7\nwhitelist: ['0x2::coin::Coin']\n")
    cfg = load_config(
        str(p),
        env={
            "HURACAN_SPARK_POLL_INTERVAL_MS": "250",
            "HURACAN_SPARK_BLACKLIST": "0x3::a::A,0x3::b::B",
        },
    )
    assert cfg.backfill_threshold == 7
    assert cfg.poll_interval_ms == 250
    assert cfg.whitelist == ["0x2::coin::Coin"]
    assert cfg.blacklist == ["0x3::a::A", "0x3::b::B"]


def test_config_rejects_unknown_keys(tmp_path):
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(env={"HURACAN_SPARK_BOGUS_KNOB": "1"})


def test_metrics_emit_and_read(spark, tmp_path):
    mt = MetricsTable(spark, str(tmp_path / "metrics"))
    mt.emit("inserted_object", 42, source="B")
    mt.emit("rpc_error", 1, rpc_method="multi_get")
    rows = {r.measurement: r for r in mt.read().collect()}
    assert rows["inserted_object"].value == 42.0
    assert '"source": "B"' in rows["inserted_object"].tags


def test_latency_stats_per_route(spark):
    import time

    now = int(time.time() * 1000)
    rows = [
        ("poll", now - 100, now - 150),
        ("poll", now - 300, now - 350),
        ("backfill", now - 5000, now - 6000),
    ]
    df = spark.createDataFrame(rows, "ingested_via string, ts_first_seen long, ts_sui long")
    out = {r.route: r for r in latency_stats(df).collect()}
    assert out["poll"].n == 2 and out["backfill"].n == 1
    assert out["backfill"].p50_ms >= 5000
    assert out["poll"].p50_ms >= 100


def test_silver_time_travel_and_vacuum(spark, tmp_path):
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=2)
    batch1 = spark.createDataFrame([("a", 1, False)], "_id string, version_ long, deleted boolean")
    batch2 = spark.createDataFrame([("a", 2, False)], "_id string, version_ long, deleted boolean")
    silver.merge(batch1)
    gen1 = silver.current_generation()
    import time as _t

    _t.sleep(0.002)  # generation names are ms timestamps
    silver.merge(batch2)
    assert silver.read().first().version_ == 2
    # S7: read the historical generation
    assert silver.read(generation=gen1).first().version_ == 1
    removed = silver.vacuum(keep=1)
    assert gen1 in removed
    assert silver.read().first().version_ == 2  # current untouched


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"), st.integers(0, 3)),  # key-set seed
            st.tuples(st.just("vacuum"), st.integers(0, 3)),  # keep
        ),
        min_size=2,
        max_size=6,
    )
)
def test_silver_vacuum_never_strands_current_pointer(ops, tmp_path_factory):
    """Property (K-storage management): under any merge/vacuum
    interleaving — including keep=0 and same-millisecond merges — the
    _CURRENT pointer always resolves to a readable generation, vacuum
    never removes the pointer target, and the newest surviving state is
    the last merge's."""
    from huracan_spark.session import get_spark

    spark = get_spark("huracan-tests", shuffle_partitions=8)
    tmp = tmp_path_factory.mktemp("silver_prop")
    silver = SilverTable(spark, str(tmp / "s"), n_buckets=2)
    last_version = None
    for i, (op, arg) in enumerate(ops):
        if op == "merge":
            batch = spark.createDataFrame(
                [(f"k{arg}", i + 1, False)],
                "_id string, version_ long, deleted boolean",
            )
            silver.merge(batch)
            last_version = i + 1
        else:
            removed = silver.vacuum(keep=arg)
            assert silver.current_generation() not in removed
        cur = silver.current_generation()
        if last_version is None:
            assert cur is None or silver.read() is not None
            continue
        # pointer target must exist on disk and be readable
        assert cur in silver.generations()
        state = silver.read()
        assert state is not None
        assert state.agg(F.max("version_")).first()[0] == last_version


def test_silver_incremental_merge_reuses_untouched_buckets(spark, tmp_path):
    """A merge touching one key must rewrite ONLY that key's bucket:
    every other manifest entry still points at the older generation's
    data (Delta-style file skipping within plain parquet)."""
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    seed = spark.createDataFrame(
        [(f"k{i}", 1, False) for i in range(64)],
        "_id string, version_ long, deleted boolean",
    )
    silver.merge(seed)
    gen1 = silver.current_generation()
    m1 = silver.manifest(gen1)
    assert len(m1) > 1  # 64 keys over 8 buckets -> several buckets

    silver.merge(
        spark.createDataFrame(
            [("k0", 2, False)], "_id string, version_ long, deleted boolean"
        )
    )
    gen2 = silver.current_generation()
    m2 = silver.manifest(gen2)
    rewritten = [b for b, rel in m2.items() if rel.startswith(gen2)]
    reused = [b for b, rel in m2.items() if rel.startswith(gen1)]
    assert len(rewritten) == 1  # only k0's bucket
    assert set(m2) == set(m1) and reused
    # state is still complete and correct through the mixed manifest
    state = {r._id: r.version_ for r in silver.read().collect()}
    assert len(state) == 64 and state["k0"] == 2 and state["k1"] == 1


def test_silver_vacuum_keeps_referenced_generations(spark, tmp_path):
    """Reference-aware vacuum: a generation whose buckets are still
    referenced by the current manifest survives keep=1, and every
    retained generation remains readable."""
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(64)],
            "_id string, version_ long, deleted boolean",
        )
    )
    gen1 = silver.current_generation()
    silver.merge(
        spark.createDataFrame(
            [("k0", 2, False)], "_id string, version_ long, deleted boolean"
        )
    )
    removed = silver.vacuum(keep=1)
    assert gen1 not in removed  # still referenced by current manifest
    for g in silver.generations():
        assert silver.read(generation=g).count() == 64
    # after the whole keyspace is rewritten, gen1 becomes garbage
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 3, False) for i in range(64)],
            "_id string, version_ long, deleted boolean",
        )
    )
    removed = silver.vacuum(keep=1)
    assert gen1 in removed
    assert silver.read().count() == 64


def test_silver_point_lookup_reads_single_bucket(spark, tmp_path):
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", i, False) for i in range(64)],
            "_id string, version_ long, deleted boolean",
        )
    )
    row = silver.read_key_bucket("k7").collect()
    assert len(row) == 1 and row[0].version_ == 7
    # the lookup plan scans one bucket directory, not the whole table
    plan = (
        silver.read_key_bucket("k7")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("_bucket=") <= 1


def test_silver_compact_makes_old_generations_vacuumable(spark, tmp_path):
    """OPTIMIZE analog: after compact(), the state is self-contained,
    so reference-aware vacuum can reclaim every older generation."""
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(64)],
            "_id string, version_ long, deleted boolean",
        )
    )
    gen1 = silver.current_generation()
    silver.merge(
        spark.createDataFrame(
            [("k0", 2, False)], "_id string, version_ long, deleted boolean"
        )
    )
    # gen1 still referenced -> not vacuumable
    assert gen1 not in silver.vacuum(keep=1)
    gen_c = silver.compact()
    assert all(rel.startswith(gen_c) for rel in silver.manifest(gen_c).values())
    removed = silver.vacuum(keep=1)
    assert gen1 in removed
    state = {r._id: r.version_ for r in silver.read().collect()}
    assert len(state) == 64 and state["k0"] == 2 and state["k63"] == 1


def test_observe_pipeline_single_pass_metrics(spark, sf_dir):
    """observe() metrics must match the separately computed truth while
    being collected in the SAME action as the consuming write."""
    from pyspark.sql import functions as F

    from huracan_spark.pipeline.metrics import observe_pipeline
    from huracan_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    observed, obs = observe_pipeline(ev, "ingest_audit")
    n_consumed = observed.count()  # the consuming action
    got = obs.get
    truth = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).collect()[0]
    assert got["n_rows"] == n_consumed == truth.n_rows
    assert got["n_errors"] == truth.n_errors
    assert abs(got["sum_value"] - truth.sum_value) < 1e-6


def test_silver_diff_change_data_feed(spark, tmp_path):
    """diff(gen_a, gen_b) emits exactly the changed keys with the right
    change_type, and reads only buckets whose file changed between the
    manifests (CDF with manifest-level file skipping)."""
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(64)],
            "_id string, version_ long, deleted boolean",
        )
    )
    gen1 = silver.current_generation()
    silver.merge(
        spark.createDataFrame(
            [("k0", 2, False), ("new1", 1, False), ("k1", 3, True)],
            "_id string, version_ long, deleted boolean",
        )
    )
    gen2 = silver.current_generation()

    changed = silver.changed_buckets(gen1, gen2)
    assert 0 < len(changed) < 8  # shared buckets skipped without a read

    cdf = silver.diff(gen1, gen2)
    rows = {r._id: (r.change_type, r.old_version, r.new_version)
            for r in cdf.collect()}
    assert rows == {
        "k0": ("update", 1, 2),
        "new1": ("insert", None, 1),
        "k1": ("delete", 1, 3),
    }

    # self-diff: nothing changed -> no buckets to read at all
    assert silver.diff(gen2, gen2) is None

    # stale-version merge produces a new generation only if keys moved;
    # merging an already-superseded row must yield an EMPTY cdf
    silver.merge(
        spark.createDataFrame(
            [("k0", 1, False)], "_id string, version_ long, deleted boolean"
        )
    )
    gen3 = silver.current_generation()
    if gen3 != gen2:
        d = silver.diff(gen2, gen3)
        assert d is None or d.count() == 0


def test_incremental_view_matches_full_recompute(spark, tmp_path):
    """Materialized grouped view folded forward from the change feed
    must equal a full recompute after every merge — inserts, updates,
    and tombstones included (incremental view maintenance over CDF)."""
    from huracan_spark.pipeline.incr_view import grouped_view, refresh_view

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=8)
    schema = "_id string, version_ long, deleted boolean, grp string, v double"
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False, f"g{i % 3}", float(i)) for i in range(40)],
            schema,
        )
    )
    gen1 = silver.current_generation()
    view = grouped_view(silver.read(), "grp", "v").persist()

    batches = [
        # updates move value mass between nothing (same grp), plus inserts
        [("k0", 2, False, "g0", 100.0), ("new1", 1, False, "g1", 7.0)],
        # tombstone k3 (was g0, v=3), update k4 upward
        [("k3", 5, True, None, None), ("k4", 3, False, "g1", 9.0)],
        # stale row (ignored) + fresh insert
        [("k4", 2, False, "g1", 1.0), ("new2", 1, False, "g2", 2.5)],
    ]
    gen_prev = gen1
    for rows in batches:
        silver.merge(spark.createDataFrame(rows, schema))
        gen_now = silver.current_generation()
        if gen_now != gen_prev:
            view = refresh_view(
                view, silver, gen_prev, gen_now, "grp", "v"
            ).persist()
            gen_prev = gen_now
        got = {r.grp: (r.n_rows, round(r.sum_value, 6)) for r in view.collect()}
        want = {
            r.grp: (r.n_rows, round(r.sum_value, 6))
            for r in grouped_view(silver.read(), "grp", "v").collect()
        }
        assert got == want


def test_silver_clone_is_zero_copy_and_independent(spark, tmp_path):
    """clone(): hardlinked snapshot — same data, no byte duplication;
    source merges and vacuum afterwards must not disturb the clone."""
    import os

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(32)],
            "_id string, version_ long, deleted boolean",
        )
    )
    clone = silver.clone(str(tmp_path / "c"))
    snap = {(r._id, r.version_) for r in clone.read().collect()}
    assert snap == {(f"k{i}", 1) for i in range(32)}

    # zero-copy: cloned files share inodes with the source
    gen = clone.current_generation()
    rel = next(iter(clone.manifest(gen).values()))
    src_dir, dst_dir = (
        os.path.join(str(tmp_path / "s"), rel),
        os.path.join(str(tmp_path / "c"), rel),
    )
    f = next(f for f in os.listdir(dst_dir) if f.endswith(".parquet"))
    assert os.stat(os.path.join(src_dir, f)).st_ino == os.stat(
        os.path.join(dst_dir, f)
    ).st_ino

    # source evolves + compacts + vacuums hard; the clone must not move
    silver.merge(
        spark.createDataFrame(
            [("k0", 9, False)], "_id string, version_ long, deleted boolean"
        )
    )
    silver.compact()
    silver.vacuum(keep=1)
    assert {(r._id, r.version_) for r in clone.read().collect()} == snap


def test_silver_clone_of_noncompacted_source_timetravels(spark, tmp_path):
    """A clone taken while the source manifest references OLDER
    generations must copy those generations' manifests too: the clone's
    generations()/vacuum()/time-travel all operate on manifest-bearing
    dirs (the r4 ADVICE FileNotFoundError class), and the clone
    reopened from disk must inherit the source's bucket count."""
    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean"
    silver.merge(
        spark.createDataFrame([(f"k{i}", 1, False) for i in range(32)], schema)
    )
    # second merge touches a strict subset of buckets -> current
    # manifest references gen-1 dirs (non-compacted source)
    silver.merge(spark.createDataFrame([("k0", 2, False)], schema))
    assert len(silver.generations()) == 2

    clone = silver.clone(str(tmp_path / "c"))
    gens = clone.generations()
    assert len(gens) >= 1
    # every clone generation dir must carry a readable manifest
    for g in gens:
        assert clone.manifest(g)
    # vacuum on the clone must not crash and must keep the current gen
    clone.vacuum(keep=1)
    assert {(r._id, r.version_) for r in clone.read().collect()} == {
        ("k0", 2), *{(f"k{i}", 1) for i in range(1, 32)}
    }
    # reopening the clone from disk inherits the persisted bucket count
    reopened = SilverTable(spark, str(tmp_path / "c"))
    assert reopened.n_buckets == 4
    reopened_src = SilverTable(spark, str(tmp_path / "s"))
    assert reopened_src.n_buckets == 4


def test_silver_forget_flow_removes_all_physical_trace(spark, tmp_path):
    """Right-to-be-forgotten: tombstone the subject's keys, compact,
    vacuum(keep=1) — afterwards NO retained parquet file contains the
    forgotten ids (tombstones keep the key envelope only, payload
    nulled), and reads exclude them."""
    import glob
    import os

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean, payload string"
    silver.merge(
        spark.createDataFrame(
            [(f"u{i}", 1, False, f"secret-{i}") for i in range(16)], schema
        )
    )
    # forget u3 and u7: tombstones with payload nulled (K2 shape)
    silver.merge(
        spark.createDataFrame(
            [("u3", 2, True, None), ("u7", 2, True, None)], schema
        )
    )
    silver.compact()
    silver.vacuum(keep=1)

    state = silver.read()
    live = state.filter(~state.deleted)
    assert live.filter(live._id.isin("u3", "u7")).count() == 0
    assert live.count() == 14

    # physical audit: the forgotten payloads exist in NO retained file
    files = glob.glob(
        os.path.join(str(tmp_path / "s"), "**", "*.parquet"), recursive=True
    )
    assert files
    remaining = spark.read.parquet(*files)
    hits = remaining.filter(
        remaining.payload.isin("secret-3", "secret-7")
    ).count()
    assert hits == 0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),   # key index
                st.integers(min_value=1, max_value=9),   # version
                st.booleans(),                            # tombstone?
                st.integers(min_value=0, max_value=2),   # group index
                st.integers(min_value=0, max_value=100),  # value
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_incremental_view_property(spark, tmp_path_factory, batches):
    """PROPERTY: for ANY merge sequence (duplicate keys, stale
    versions, tombstones, group moves), the CDF-folded view equals the
    full recompute after every generation."""
    from huracan_spark.pipeline.incr_view import grouped_view, refresh_view

    tmp = tmp_path_factory.mktemp("ivp")
    silver = SilverTable(spark, str(tmp / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean, grp string, v double"
    view = None
    gen_prev = None
    for rows in batches:
        df = spark.createDataFrame(
            [
                (
                    f"k{ki}",
                    ver,
                    dead,
                    None if dead else f"g{gi}",
                    None if dead else float(val),
                )
                for ki, ver, dead, gi, val in rows
            ],
            schema,
        )
        silver.merge(df)
        gen_now = silver.current_generation()
        if view is None:
            view = grouped_view(silver.read(), "grp", "v").persist()
        elif gen_now != gen_prev:
            view = refresh_view(
                view, silver, gen_prev, gen_now, "grp", "v"
            ).persist()
        gen_prev = gen_now
        got = {
            r.grp: (r.n_rows, round(r.sum_value, 6)) for r in view.collect()
        }
        want = {
            r.grp: (r.n_rows, round(r.sum_value, 6))
            for r in grouped_view(silver.read(), "grp", "v").collect()
        }
        assert got == want


def test_silver_concurrent_merges_no_lost_updates(spark, tmp_path):
    """Optimistic concurrency (the Delta MERGE commit protocol over
    plain parquet): several writers merging concurrently into the same
    table must all land — the _CURRENT compare-and-swap forces losers
    to re-merge on top of the winner, so no batch is silently
    overwritten — and rolled-back attempts leave no orphan generation
    dirs behind."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    from huracan_spark.pipeline.silver import SilverTable

    path = str(tmp_path / "s")
    schema = "_id string, version_ long, deleted boolean, payload string"
    # seed so every writer starts from the same non-empty state
    SilverTable(spark, path, n_buckets=4).merge(
        spark.createDataFrame([("seed", 1, False, "s")], schema)
    )

    def writer(w: int) -> None:
        t = SilverTable(spark, path, n_buckets=4)
        for r in range(3):
            t.merge(
                spark.createDataFrame(
                    [(f"w{w}k{k}", r + 1, False, f"p{w}-{r}") for k in range(8)],
                    schema,
                )
            )

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(writer, range(4)))

    final = SilverTable(spark, path, n_buckets=4)
    state = {r._id: (r.version_, r.payload) for r in final.read().collect()}
    assert state["seed"] == (1, "s")
    for w in range(4):
        for k in range(8):
            assert state[f"w{w}k{k}"] == (3, f"p{w}-2"), (w, k)
    # every surviving generation dir carries a manifest (losers rolled
    # their orphan dirs back), and no commit lock is left behind
    for g in final.generations():
        assert _os.path.exists(_os.path.join(path, g, "manifest.json")), g
    assert not _os.path.exists(_os.path.join(path, "_COMMIT_LOCK"))


def test_silver_compact_racing_merge_preserves_all_writes(spark, tmp_path):
    """OPTIMIZE racing MERGE: a compaction that loses the pointer race
    to a concurrent merge must retry against the merged state — never
    silently discard it."""
    from concurrent.futures import ThreadPoolExecutor

    from huracan_spark.pipeline.silver import SilverTable

    path = str(tmp_path / "s")
    schema = "_id string, version_ long, deleted boolean"
    SilverTable(spark, path, n_buckets=4).merge(
        spark.createDataFrame([(f"k{i}", 1, False) for i in range(16)], schema)
    )

    def merger() -> None:
        t = SilverTable(spark, path, n_buckets=4)
        for r in range(3):
            t.merge(
                spark.createDataFrame(
                    [(f"m{r}k{k}", 1, False) for k in range(4)], schema
                )
            )

    def compactor() -> None:
        t = SilverTable(spark, path, n_buckets=4)
        for _ in range(2):
            t.compact()

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1, f2 = ex.submit(merger), ex.submit(compactor)
        f1.result(), f2.result()

    final = SilverTable(spark, path, n_buckets=4)
    ids = {r._id for r in final.read().collect()}
    assert {f"k{i}" for i in range(16)} <= ids
    for r in range(3):
        assert {f"m{r}k{k}" for k in range(4)} <= ids, r


def test_silver_schema_evolution_on_merge(spark, tmp_path):
    """Delta mergeSchema semantics: a batch may ADD a column (rows in
    untouched buckets read it back as null) or OMIT one (an old
    writer's rows get nulls); compact() materializes the merged schema
    everywhere."""
    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    silver.merge(
        spark.createDataFrame(
            [(f"k{i}", 1, False) for i in range(16)],
            "_id string, version_ long, deleted boolean",
        )
    )
    # evolved batch: adds `quality`, touches only k0's bucket
    silver.merge(
        spark.createDataFrame(
            [("k0", 2, False, 0.9)],
            "_id string, version_ long, deleted boolean, quality double",
        )
    )
    state = silver.read()
    assert "quality" in state.columns
    rows = {r._id: r.asDict().get("quality") for r in state.collect()}
    assert rows["k0"] == 0.9
    assert rows["k1"] is None  # untouched bucket reads the column as null
    assert len(rows) == 16

    # old-schema writer: omits `quality`; its rows get nulls, existing
    # quality values in other keys survive
    silver.merge(
        spark.createDataFrame(
            [("k1", 2, False)], "_id string, version_ long, deleted boolean"
        )
    )
    rows = {r._id: (r.version_, r.asDict().get("quality")) for r in silver.read().collect()}
    assert rows["k1"] == (2, None)
    assert rows["k0"] == (2, 0.9)

    # compact materializes one schema across all buckets
    silver.compact()
    state = silver.read()
    assert "quality" in state.columns and state.count() == 16


def test_silver_history_log(spark, tmp_path):
    """DESCRIBE HISTORY analog: every generation records the operation
    that produced it, newest first."""
    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean"
    silver.merge(spark.createDataFrame([("a", 1, False)], schema))
    silver.merge(spark.createDataFrame([("b", 1, False)], schema))
    silver.compact()
    h = silver.history()
    assert [e["operation"] for e in h] == ["OPTIMIZE", "MERGE", "MERGE"]
    assert all("ts_ms" in e for e in h)
    assert h[1]["touched_buckets"] >= 1

    clone = silver.clone(str(tmp_path / "c"))
    ch = clone.history()
    assert ch[0]["operation"] == "CLONE"
    assert ch[0]["source"] == str(tmp_path / "s")


def test_silver_restore_and_timestamp_time_travel(spark, tmp_path):
    """RESTORE rolls the table back by committing a manifest-only
    generation mirroring the target (no data copy); read_as_of picks
    the newest generation committed at or before a timestamp; vacuum
    after a restore keeps everything the restored state references."""
    import time as _t

    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean"
    silver.merge(spark.createDataFrame([("a", 1, False)], schema))
    gen1 = silver.current_generation()
    t_after_gen1 = int(_t.time() * 1000)
    _t.sleep(0.002)
    silver.merge(spark.createDataFrame([("a", 2, False), ("b", 1, False)], schema))

    # AS OF: a timestamp between the two commits resolves to gen1
    asof = silver.read_as_of(t_after_gen1)
    assert {(r._id, r.version_) for r in asof.collect()} == {("a", 1)}
    assert silver.read_as_of(0) is None  # before the first commit

    # RESTORE to gen1: current state mirrors it, history shows the op
    silver.restore(gen1)
    assert {(r._id, r.version_) for r in silver.read().collect()} == {("a", 1)}
    h = silver.history()
    assert h[0]["operation"] == "RESTORE" and h[0]["restored"] == gen1

    # vacuum keeps the restored state readable (data referenced by the
    # new current generation's manifest survives)
    silver.vacuum(keep=1)
    assert {(r._id, r.version_) for r in silver.read().collect()} == {("a", 1)}

    # the table keeps working after a restore: a fresh merge wins again
    silver.merge(spark.createDataFrame([("a", 3, False)], schema))
    assert {(r._id, r.version_) for r in silver.read().collect()} == {("a", 3)}


def test_silver_empty_batch_merge_is_a_noop(spark, tmp_path):
    """An empty batch (a routine streaming micro-batch shape) must not
    mint a no-op generation — pointer, history, and state all stay
    put, and metrics report zeros."""
    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    schema = "_id string, version_ long, deleted boolean"
    empty = spark.createDataFrame([], schema)

    # empty merge on an EMPTY table: still no generation
    m = silver.merge(empty, collect_metrics=True)
    assert silver.current_generation() is None
    assert m.as_dict() == {"inserted": 0, "modified": 0, "unchanged": 0}

    silver.merge(spark.createDataFrame([("a", 1, False)], schema))
    gen = silver.current_generation()
    m = silver.merge(empty, collect_metrics=True)
    assert silver.current_generation() == gen
    assert len(silver.generations()) == 1
    assert m.as_dict() == {"inserted": 0, "modified": 0, "unchanged": 0}
    assert {(r._id, r.version_) for r in silver.read().collect()} == {("a", 1)}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.integers(0, 2),   # key
                st.integers(1, 4),   # version (dense -> ties)
                st.booleans(),       # tombstone?
            ),
            st.tuples(st.just("compact"), st.none(), st.none(), st.none()),
            st.tuples(st.just("vacuum"), st.integers(1, 3), st.none(), st.none()),
            st.tuples(st.just("restore"), st.integers(0, 7), st.none(), st.none()),
        ),
        min_size=3,
        max_size=8,
    )
)
def test_silver_storage_ops_model_property(ops, tmp_path_factory):
    """Model-based property over the FULL storage-op surface: any
    interleaving of MERGE (with version ties and tombstones), OPTIMIZE,
    reference-aware VACUUM, and RESTORE must keep the on-disk state
    equal to a trivial in-memory model applying the documented K1/K2
    semantics (higher version wins; tombstone wins an equal-version
    tie; restore rolls back to the snapshot's state exactly)."""
    from huracan_spark.session import get_spark

    spark = get_spark("huracan-tests", shuffle_partitions=8)
    tmp = tmp_path_factory.mktemp("silver_model")
    silver = SilverTable(spark, str(tmp / "s"), n_buckets=2)
    model: dict[str, tuple[int, bool]] = {}
    snapshots: list[tuple[str, dict]] = []
    for op, a, b, c in ops:
        if op == "merge":
            k, v, d = f"k{a}", b, c
            silver.merge(
                spark.createDataFrame(
                    [(k, v, d)], "_id string, version_ long, deleted boolean"
                )
            )
            s = model.get(k)
            if s is None or v > s[0] or (v == s[0] and d and not s[1]):
                model[k] = (v, d)
        elif op == "compact":
            silver.compact()
        elif op == "vacuum":
            removed = silver.vacuum(keep=a)
            assert silver.current_generation() not in removed
        else:  # restore to a surviving snapshot
            live = [(g, m) for g, m in snapshots if g in silver.generations()]
            if not live:
                continue
            g, m = live[a % len(live)]
            silver.restore(g)
            model = dict(m)
        gen = silver.current_generation()
        if gen is None:
            assert not model
            continue
        snapshots.append((gen, dict(model)))
        got = {
            r._id: (r.version_, r.deleted) for r in silver.read().collect()
        }
        assert got == model, (op, a, b, c)


def test_silver_detail(spark, tmp_path):
    """DESCRIBE DETAIL analog: location, file/byte counts over the
    current manifest, committed columns, and commit count."""
    from huracan_spark.pipeline.silver import SilverTable

    silver = SilverTable(spark, str(tmp_path / "s"), n_buckets=4)
    assert silver.detail()["current_generation"] is None

    schema = "_id string, version_ long, deleted boolean"
    silver.merge(
        spark.createDataFrame([(f"k{i}", 1, False) for i in range(16)], schema)
    )
    silver.merge(spark.createDataFrame([("k0", 2, False)], schema))
    d = silver.detail()
    assert d["current_generation"] == silver.current_generation()
    assert d["populated_buckets"] >= 1 and d["num_files"] >= d["populated_buckets"]
    assert d["size_bytes"] > 0
    assert d["columns"] == ["_id", "version_", "deleted"]
    assert d["num_commits"] == 2
