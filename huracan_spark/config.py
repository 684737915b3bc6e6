"""Engine configuration: YAML + environment overlay.

Mirror of the reference's Figment-based ``AppConfig``
(main/src/conf.rs:165-203): a YAML file provides defaults and
``HURACAN_SPARK_``-prefixed environment variables override
dot-separated paths (the reference uses ``APP_`` with ``_``
separators, conf.rs:195-199).

Only knobs that mean something in the Spark port are carried over;
channel sizes and worker pools map to shuffle partitions / trigger
settings (SURVEY §2.3 M6).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

__all__ = ["EngineConfig", "load_config"]

ENV_PREFIX = "HURACAN_SPARK_"


@dataclass
class EngineConfig:
    # scan / ingest (main/config.yaml:10-17)
    backfill_threshold: int = 3
    poll_interval_ms: int = 100
    # enrichment (main/config.yaml:41-42)
    rpc_batch_size: int = 50
    # sink batching maps to micro-batch trigger; kept for parity docs
    sink_batch_size: int = 1024
    # type filters (main/src/conf.rs:139-163)
    whitelist: list[str] = field(default_factory=list)
    blacklist: list[str] = field(default_factory=list)
    # spark-side sizing (replaces workers.* pools, main/config.yaml:36-39)
    shuffle_partitions: int = 32
    silver_buckets: int = 32
    # dedup state horizon (the 120-checkpoint GC analog, etl.rs:306)
    dedup_watermark: str = "120 seconds"


_INT_FIELDS = {
    "backfill_threshold",
    "poll_interval_ms",
    "rpc_batch_size",
    "sink_batch_size",
    "shuffle_partitions",
    "silver_buckets",
}
_LIST_FIELDS = {"whitelist", "blacklist"}


def load_config(path: str | None = None, env: dict[str, str] | None = None) -> EngineConfig:
    """YAML file (optional) + env overlay -> EngineConfig."""
    data: dict = {}
    if path and os.path.exists(path):
        if yaml is None:
            raise RuntimeError("pyyaml unavailable but a config file was given")
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    env = dict(os.environ if env is None else env)
    for key, raw in env.items():
        if not key.startswith(ENV_PREFIX):
            continue
        name = key[len(ENV_PREFIX):].lower()
        if name in _LIST_FIELDS:
            data[name] = [v for v in raw.split(",") if v]
        elif name in _INT_FIELDS:
            data[name] = int(raw)
        else:
            data[name] = raw
    known = {f for f in EngineConfig.__dataclass_fields__}
    unknown = set(data) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return EngineConfig(**data)
