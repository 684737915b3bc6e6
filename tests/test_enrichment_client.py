"""Hermetic tests for the live enrichment stage (S6/M8/K7): batching,
client rotation, exponential backoff, per-id fallback, DLQ flagging."""

from __future__ import annotations

from dataclasses import dataclass, field

import pytest

from huracan_spark.sources.enrichment import (
    RPC_BATCH_SIZE,
    ClientPool,
    EnrichmentClient,
    RateLimited,
    enrich_via_rpc,
)


@dataclass
class FakeTransport:
    """Scripted transport: knows `content`; rate-limits `limit_first` calls;
    errors whole batches containing `poison` ids."""

    content: dict
    limit_first: int = 0
    poison: set = field(default_factory=set)
    calls: list = field(default_factory=list)

    def multi_get(self, ids):
        self.calls.append(list(ids))
        if self.limit_first > 0:
            self.limit_first -= 1
            raise RateLimited()
        if len(ids) > 1 and any(i in self.poison for i in ids):
            raise RuntimeError("batch failed")
        if len(ids) == 1 and ids[0] in self.poison:
            raise RuntimeError("id failed")
        return {k: self.content[k] for k in ids if k in self.content}


def _content(n):
    return {
        (f"0x{i:02x}", 1): {
            "object_type": "0x2::coin::Coin",
            "owner_kind": "AddressOwner",
            "owner_address": "0xa",
            "fields_json": "{}",
        }
        for i in range(n)
    }


def test_batch_chunking():
    content = _content(120)
    t = FakeTransport(content)
    client = EnrichmentClient(ClientPool([t]))
    keys = list(content)
    rows = []
    for i in range(0, len(keys), RPC_BATCH_SIZE):
        rows.extend(client.fetch_batch(keys[i : i + RPC_BATCH_SIZE]))
    assert len(rows) == 120 and not any(r["fetch_failed"] for r in rows)
    assert all(len(c) <= RPC_BATCH_SIZE for c in t.calls)


def test_rate_limit_rotation_and_backoff():
    content = _content(10)
    t1 = FakeTransport(content, limit_first=3)
    t2 = FakeTransport(content)
    sleeps = []
    pool = ClientPool([t1, t2])
    pool.sleep = sleeps.append
    client = EnrichmentClient(pool)
    rows = client.fetch_batch(list(content))
    assert not any(r["fetch_failed"] for r in rows)
    # second client was lazily activated after the first 429
    assert t2.calls, "rotation did not engage the second endpoint"


def test_backoff_is_exponential_and_capped():
    content = _content(2)
    t = FakeTransport(content, limit_first=7)
    sleeps = []
    clock = {"t": 0.0}
    pool = ClientPool([t])

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    pool.sleep = fake_sleep
    pool.clock = lambda: clock["t"]
    EnrichmentClient(pool).fetch_batch(list(content))
    # macros/src/lib.rs: min(2^fails * 0.25, 10); fails=1.. -> 0.5,1,2,4,8,10,10
    assert sleeps == [0.5, 1.0, 2.0, 4.0, 8.0, 10.0, 10.0]


def test_per_id_fallback_and_dlq_flag():
    content = _content(5)
    poison = {("0x02", 1)}
    t = FakeTransport(content, poison=poison)
    client = EnrichmentClient(ClientPool([t]))
    rows = client.fetch_batch(list(content))
    failed = {(r["object_id"], r["version"]) for r in rows if r["fetch_failed"]}
    assert failed == poison  # only the poison id is DLQ-flagged
    ok = [r for r in rows if not r["fetch_failed"]]
    assert len(ok) == 4 and all(r["object_type"] for r in ok)


def test_enrich_via_rpc_dataframe(spark):
    content = _content(60)
    changes = spark.createDataFrame(
        [(oid, ver) for (oid, ver) in content] + [("0xdead", 9)],
        "object_id string, version long",
    )

    def make_client():
        return EnrichmentClient(ClientPool([FakeTransport(_content(60))]))

    out = enrich_via_rpc(changes, make_client)
    rows = out.collect()
    assert len(rows) == 61
    dead = [r for r in rows if r.object_id == "0xdead"]
    assert dead and dead[0].fetch_failed
    assert sum(1 for r in rows if not r.fetch_failed) == 60
