"""Reader-feature gate shared by every SilverTable manifest consumer.

Delta protocol ``readerFeatures`` parity: a manifest stamped with a
feature outside READER_FEATURES was written by newer code whose
generations this reader would silently misread (e.g. a pre-DV reader
would return deleted rows as live) — every loader must refuse loudly.
Kept in a dependency-free module so the CDF streaming source's
executor-side pure-Python loaders can import it without pulling the
whole SilverTable machinery into Python workers.
"""

from __future__ import annotations

READER_FEATURES = frozenset({"mor", "dv", "colmap"})


def check_reader_features(raw: dict, generation: str) -> dict:
    """Validate a parsed manifest dict; returns it unchanged or raises."""
    unknown = set(raw.get("features", ())) - READER_FEATURES
    if unknown:
        raise ValueError(
            f"generation {generation} requires reader features "
            f"{sorted(unknown)} this version does not implement — "
            "reading it would silently return wrong rows; upgrade "
            "the reader (Delta protocol readerFeatures semantics)"
        )
    return raw
