"""Live object-enrichment stage (S6) with client rotation + backoff (M8).

In tests and fixtures, enrichment is a join against ``objects_content``
(pipeline/ingest.enrich).  In live mode the reference batch-fetches
object content over JSON-RPC, 50 ids per request, with per-call client
rotation and exponential backoff on HTTP 429
(main/src/etl.rs:1135-1201, macros/src/lib.rs:30-120,
main/src/client.rs:23-56).

Spark-first shape: a ``mapInPandas`` stage — each Arrow batch is
chunked into RPC-sized requests inside the executor, so the network
fan-out scales with partitions and NOTHING round-trips the driver.
The transport is injected (``Transport`` protocol) so tests exercise
batching/retry/fallback logic hermetically; the HTTP transport is a
thin adapter at the edge.

Retry policy (macros/src/lib.rs:40-116): on rate-limit, backoff
``min(2^fails * 0.25s, 10s)``, rotate to the least-backed-off client,
lazily spawn the next configured endpoint.  On batch failure, fall
back to per-id fetches; ids that still fail come back flagged for the
DLQ (K7) instead of raising — the stream must keep flowing.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "Transport",
    "RateLimited",
    "ClientPool",
    "EnrichmentClient",
    "enrich_via_rpc",
    "ENRICHED_SCHEMA",
]

RPC_BATCH_SIZE = 50  # objectqueries.batchsize, main/config.yaml:41
BACKOFF_BASE_S = 0.25  # macros/src/lib.rs backoff quantum
BACKOFF_CAP_S = 10.0


class RateLimited(Exception):
    """HTTP 429 analog."""


class Transport(Protocol):
    """One RPC endpoint: fetch content for <= RPC_BATCH_SIZE ids."""

    def multi_get(self, ids: list[tuple[str, int]]) -> dict[tuple[str, int], dict]: ...


@dataclass
class _ClientState:
    transport: Transport
    fails: int = 0
    not_before: float = 0.0


@dataclass
class ClientPool:
    """M8 rotation: pick the least-backed-off client; on RateLimited,
    back off exponentially and lazily activate the next endpoint."""

    transports: list[Transport]
    _active: list[_ClientState] = field(default_factory=list)
    sleep = staticmethod(time.sleep)  # injectable for tests
    clock = staticmethod(time.monotonic)

    def __post_init__(self) -> None:
        if not self.transports:
            raise ValueError("need at least one transport")
        self._active = [_ClientState(self.transports[0])]

    def _pick(self) -> _ClientState:
        self._active.sort(key=lambda s: s.not_before)
        best = self._active[0]
        now = self.clock()
        if best.not_before > now and len(self._active) < len(self.transports):
            nxt = self.transports[len(self._active)]
            self._active.append(_ClientState(nxt))
            return self._active[-1]
        if best.not_before > now:
            self.sleep(best.not_before - now)
        return best

    def call(self, ids: list[tuple[str, int]]) -> dict[tuple[str, int], dict]:
        while True:
            st = self._pick()
            try:
                out = st.transport.multi_get(ids)
                st.fails = 0
                return out
            except RateLimited:
                st.fails += 1
                st.not_before = self.clock() + min(
                    (2**st.fails) * BACKOFF_BASE_S, BACKOFF_CAP_S
                )


ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("object_id", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("owner_kind", T.StringType(), True),
        T.StructField("owner_address", T.StringType(), True),
        T.StructField("fields_json", T.StringType(), True),
        T.StructField("fetch_failed", T.BooleanType(), False),
    ]
)

_CONTENT_KEYS = ("object_type", "owner_kind", "owner_address", "fields_json")


@dataclass
class EnrichmentClient:
    pool: ClientPool

    def fetch_batch(self, ids: list[tuple[str, int]]) -> list[dict]:
        """Batch fetch; on batch error fall back per-id
        (etl.rs:1155-1179); unfetchable ids flagged for the DLQ."""
        try:
            got = self.pool.call(ids)
        except Exception:
            got = {}
            for key in ids:
                try:
                    got.update(self.pool.call([key]))
                except Exception:
                    pass  # flagged below
        rows = []
        for oid, ver in ids:
            body = got.get((oid, ver))
            rows.append(
                {
                    "object_id": oid,
                    "version": ver,
                    **{k: (body or {}).get(k) for k in _CONTENT_KEYS},
                    "fetch_failed": body is None,
                }
            )
        return rows


def enrich_via_rpc(changes: DataFrame, make_client) -> DataFrame:
    """mapInPandas enrichment: per Arrow batch, chunk ids into
    RPC_BATCH_SIZE requests through a freshly-built client
    (``make_client`` must be picklable — transports are constructed
    inside the executor, never shipped from the driver)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client: EnrichmentClient = make_client()
        for pdf in batches:
            keys = list(
                dict.fromkeys(zip(pdf["object_id"], pdf["version"].astype(int)))
            )
            rows: list[dict] = []
            for i in range(0, len(keys), RPC_BATCH_SIZE):
                rows.extend(client.fetch_batch(keys[i : i + RPC_BATCH_SIZE]))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in ENRICHED_SCHEMA.fields],
            )

    return changes.select("object_id", "version").mapInPandas(
        _run, schema=ENRICHED_SCHEMA
    )
