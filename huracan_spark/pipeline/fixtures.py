"""Deterministic huracan-domain fixture generator (FIXTURES.md §1-§3).

Generates the three domain input tables — ``object_changes``,
``objects_content``, ``completed_checkpoints`` — as parquet, seeded,
so tests and the golden silver-state oracle are reproducible without
the network. This models the Sui RPC crawl output the reference
consumes (ObjectItem stream, main/src/etl.rs:53-63 + enrichment body,
main/src/etl.rs:1139-1147).

Not driver data: the driver's TESTDATA star schema backs the
driver-checked queries; these fixtures back the huracan-specific
pipeline semantics (versioned MERGE, tombstones, dynamic-field join,
triage, DLQ, completion accounting) in pytest.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = ["FixtureConfig", "generate", "TYPE_POOL", "DYNFIELD_TYPE"]

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

# ~40 types over ~12 packages, ~30% generic (FIXTURES.md §2).
_PACKAGES = [f"0x{h}" for h in ("2", "3", "a1", "b2", "c3", "d4", "e5", "f6", "17", "28", "39", "4a")]
DYNFIELD_TYPE = "0x2::dynamic_field::Field<0x1::string::String, {v}>"
_PLAIN = [
    "{p}::coin::Coin",
    "{p}::token::Token",
    "{p}::nft::Nft",
    "{p}::pool::Pool",
    "{p}::profile::Profile",
    "{p}::registry::Registry",
    "{p}::cap::OwnerCap",
    "{p}::clock::Clock",
]
_GENERIC_ARGS = ["0x2::sui::SUI", "0x1::string::String", "0xa1::token::Token<0x2::sui::SUI>"]


def _build_type_pool() -> list[str]:
    pool: list[str] = []
    for i, pkg in enumerate(_PACKAGES):
        for j, tmpl in enumerate(_PLAIN):
            if len(pool) >= 36:
                break
            ty = tmpl.format(p=pkg)
            if (i + j) % 3 == 0:  # ~30% carry generics
                ty += f"<{_GENERIC_ARGS[(i + j) % len(_GENERIC_ARGS)]}>"
            pool.append(ty)
    # dynamic-field wrapper types (Q7/Q8 self-join path)
    pool.append(DYNFIELD_TYPE.format(v="0xa1::profile::Profile"))
    pool.append(DYNFIELD_TYPE.format(v="0x2::sui::SUI"))
    return pool


TYPE_POOL = _build_type_pool()


def _b58(rng: np.random.Generator, n: int, length: int = 32) -> np.ndarray:
    chars = rng.integers(0, len(_B58), size=(n, length))
    return np.array(["".join(_B58[c] for c in row) for row in chars])


def _object_ids(n: int) -> np.ndarray:
    # deterministic 0x + 64 hex ids derived from the index
    return np.array(
        ["0x" + hashlib.sha256(f"obj-{i}".encode()).hexdigest() for i in range(n)]
    )


@dataclass
class FixtureConfig:
    seed: int = 42
    n_objects: int = 2_000
    n_checkpoints: int = 400
    max_versions: int = 4
    dynfield_frac: float = 0.08
    dup_row_frac: float = 0.03
    cross_route_dup_frac: float = 0.05
    rpc_error_frac: float = 0.02
    missing_content_frac: float = 0.01
    null_ts_sui_frac: float = 0.01


def _fields_json(rng: np.random.Generator, is_dynfield: bool, parent: str | None) -> str:
    """Recursive Move-value payload per SURVEY §1.3 grammar."""
    depth_fields = {
        "balance": int(rng.integers(0, 10**9)),
        "active": bool(rng.integers(0, 2)),
        "tag": f"t{int(rng.integers(0, 50))}",
        "ids": [f"0x{int(rng.integers(0, 16**8)):08x}" for _ in range(int(rng.integers(0, 3)))],
        "meta": {
            "type": "0x1::meta::Meta",
            "fields": {"score": int(rng.integers(0, 1000)), "note": None},
        },
    }
    if is_dynfield:
        # dynamic-field objects MUST carry name + value; value sometimes a
        # struct containing `owner` (exercises the dotted path filter,
        # server/src/main.rs:304-306)
        value: object
        if rng.random() < 0.5 and parent is not None:
            value = {
                "type": "0xa1::profile::Profile",
                "fields": {"owner": parent, "level": int(rng.integers(0, 10))},
            }
        else:
            value = int(rng.integers(0, 10**6))
        return json.dumps({"name": f"key-{int(rng.integers(0, 100))}", "value": value})
    return json.dumps(depth_fields)


def generate(out_dir: str, cfg: FixtureConfig | None = None) -> dict[str, str]:
    """Write the three fixture parquet files; returns {name: path}."""
    cfg = cfg or FixtureConfig()
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(out_dir, exist_ok=True)

    ids = _object_ids(cfg.n_objects)
    is_dyn = rng.random(cfg.n_objects) < cfg.dynfield_frac
    # dynamic-field children point at a non-dynfield parent object
    plain_idx = np.flatnonzero(~is_dyn)
    parent_of = {
        i: ids[plain_idx[int(rng.integers(0, len(plain_idx)))]]
        for i in np.flatnonzero(is_dyn)
    }
    # Zipf-skewed owner addresses (~500 distinct, FIXTURES.md §2)
    n_addr = 500
    addr_pool = np.array(
        ["0x" + hashlib.sha256(f"addr-{i}".encode()).hexdigest()[:40] for i in range(n_addr)]
    )
    zipf_w = 1.0 / np.arange(1, n_addr + 1)
    zipf_w /= zipf_w.sum()

    obj_type = np.array([
        TYPE_POOL[-1 - (i % 2)] if is_dyn[i] else TYPE_POOL[int(rng.integers(0, len(TYPE_POOL) - 2))]
        for i in range(cfg.n_objects)
    ])
    owner_kind = np.where(
        is_dyn,
        "ObjectOwner",
        rng.choice(["AddressOwner", "ObjectOwner", "Shared", "Immutable"], size=cfg.n_objects, p=[0.6, 0.15, 0.15, 0.1]),
    )

    # --- object_changes ------------------------------------------------
    n_versions = rng.integers(1, cfg.max_versions + 1, size=cfg.n_objects)
    rows = []
    base_ts = 1_700_000_000_000
    for i in range(cfg.n_objects):
        versions = np.sort(rng.choice(np.arange(1, 50), size=n_versions[i], replace=False))
        # last change of ~6% of objects is a deletion (K2 tombstone path)
        del_at_last = rng.random() < 0.06
        for k, v in enumerate(versions):
            cp = int(rng.integers(1, cfg.n_checkpoints + 1))
            if k == 0:
                ctype = "created"
            elif del_at_last and k == len(versions) - 1:
                ctype = "deleted"
            else:
                ctype = "mutated"
            ts_sui = base_ts + cp * 1000 + int(rng.integers(0, 900))
            rows.append(
                (
                    cp,
                    None,  # tx digest filled below
                    ctype,
                    ids[i],
                    int(v),
                    ts_sui,
                    ts_sui + int(rng.integers(10, 5000)),
                    ("poll", "livescan", "backfill")[int(rng.integers(0, 3))],
                )
            )
    # a sprinkle of dropped-by-P1 change types riding along
    n_noise = len(rows) // 20
    for _ in range(n_noise):
        i = int(rng.integers(0, cfg.n_objects))
        cp = int(rng.integers(1, cfg.n_checkpoints + 1))
        ts = base_ts + cp * 1000
        rows.append(
            (
                cp,
                None,
                ("wrapped", "transferred", "published")[int(rng.integers(0, 3))],
                ids[i],
                int(rng.integers(1, 50)),
                ts,
                ts + 100,
                "livescan",
            )
        )

    ch = pd.DataFrame(
        rows,
        columns=[
            "cp",
            "tx_digest",
            "change_type",
            "object_id",
            "version",
            "ts_sui",
            "ts_first_seen",
            "ingested_via",
        ],
    )
    # several changes share one tx digest; ~5% of tx duplicated across
    # routes (M2 reconciliation), ~3% full-row dups (M3 / K1 idempotence)
    n_tx = max(len(ch) // 3, 1)
    tx_pool = _b58(rng, n_tx, 20)
    ch["tx_digest"] = tx_pool[rng.integers(0, n_tx, size=len(ch))]
    cross = ch.sample(frac=cfg.cross_route_dup_frac, random_state=cfg.seed).copy()
    cross["ingested_via"] = np.where(cross["ingested_via"] == "poll", "livescan", "poll")
    dups = ch.sample(frac=cfg.dup_row_frac, random_state=cfg.seed + 1)
    ch = pd.concat([ch, cross, dups], ignore_index=True)
    # ~1% null ts_sui (Option<u64>, etl.rs:59)
    null_ts = rng.random(len(ch)) < cfg.null_ts_sui_frac
    ch.loc[null_ts, "ts_sui"] = pd.NA
    ch["ts_sui"] = ch["ts_sui"].astype("Int64")
    # emit out of order
    ch = ch.sample(frac=1.0, random_state=cfg.seed + 2).reset_index(drop=True)

    # --- objects_content ----------------------------------------------
    live = ch[ch.change_type.isin(["created", "mutated"])][
        ["object_id", "version"]
    ].drop_duplicates()
    idx_of = {oid: i for i, oid in enumerate(ids)}
    crows = []
    for oid, ver in live.itertuples(index=False):
        i = idx_of[oid]
        if rng.random() < cfg.missing_content_frac:
            continue  # no content row at all -> DLQ path (K7)
        err = (
            ("deleted", "not_exists", "unknown", "display_error", "dynamic_field_not_found")[
                int(rng.integers(0, 5))
            ]
            if rng.random() < cfg.rpc_error_frac
            else None
        )
        kind = owner_kind[i]
        if kind in ("AddressOwner", "ObjectOwner"):
            addr = (
                parent_of[i]
                if i in parent_of
                else str(addr_pool[int(rng.choice(n_addr, p=zipf_w))])
            )
        else:
            addr = None
        crows.append(
            (
                oid,
                int(ver),
                str(obj_type[i]),
                str(kind),
                addr,
                int(rng.integers(1, 1000)) if kind == "Shared" else None,
                "".join(_B58[c] for c in rng.integers(0, len(_B58), 30)),
                str(tx_pool[int(rng.integers(0, n_tx))]),
                str(int(rng.integers(0, 10**7))),
                bool(rng.integers(0, 2)),
                _fields_json(rng, bool(is_dyn[i]), parent_of.get(i)),
                base64.b64encode(hashlib.sha256(f"{oid}:{ver}".encode()).digest()).decode(),
                err,
            )
        )
    co = pd.DataFrame(
        crows,
        columns=[
            "object_id",
            "version",
            "object_type",
            "owner_kind",
            "owner_address",
            "initial_shared_version",
            "digest",
            "previous_transaction",
            "storage_rebate",
            "has_public_transfer",
            "fields_json",
            "bcs_b64",
            "rpc_error",
        ],
    )
    co["initial_shared_version"] = co["initial_shared_version"].astype("Int64")

    # --- completed_checkpoints ----------------------------------------
    # gappy coverage incl. the reference's own unit-test pattern
    # {1,2,3,7,9,10,11} (utils.rs:44-47) + one stop marker
    done = sorted(
        set([1, 2, 3, 7, 9, 10, 11])
        | set(int(x) for x in rng.choice(np.arange(12, cfg.n_checkpoints), size=cfg.n_checkpoints // 3, replace=False))
    )
    cc = pd.DataFrame({"checkpoint_id": done})
    cc["stop"] = pd.array([True if c == 2 else None for c in cc.checkpoint_id], dtype="boolean")

    paths = {}
    for name, df in (("object_changes", ch), ("objects_content", co), ("completed_checkpoints", cc)):
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
