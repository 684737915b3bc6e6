"""Owner-union normalization (server/src/main.rs:397-418).

The reference's owner field is a tagged union::

    {AddressOwner: str} | {ObjectOwner: str}
    | {Shared: {initial_shared_version: i64}} | "Immutable"

Flattened representation used across the engine (and in the fixture
tables, FIXTURES.md §2): ``owner_kind`` + ``owner_address`` +
``initial_shared_version``.  These helpers express the union's
predicates as pushdown-friendly column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "OWNER_KINDS",
    "is_address_owner",
    "is_object_owner",
    "owned_by",
    "owned_by_any",
]

OWNER_KINDS = ("AddressOwner", "ObjectOwner", "Shared", "Immutable")


def is_address_owner(kind: Column | str = "owner_kind") -> Column:
    k = F.col(kind) if isinstance(kind, str) else kind
    return k == "AddressOwner"


def is_object_owner(kind: Column | str = "owner_kind") -> Column:
    k = F.col(kind) if isinstance(kind, str) else kind
    return k == "ObjectOwner"


def owned_by(owner: str, kind: str = "owner_kind", addr: str = "owner_address") -> Column:
    """Q3 semantics: AddressOwner == o OR ObjectOwner == o
    (server/src/main.rs:283-284 builds exactly this ``$or``)."""
    return (F.col(kind).isin("AddressOwner", "ObjectOwner")) & (F.col(addr) == owner)


def owned_by_any(owners: list[str], kind: str = "owner_kind", addr: str = "owner_address") -> Column:
    """Q4: multi-owner ``$in`` variant."""
    return (F.col(kind).isin("AddressOwner", "ObjectOwner")) & (
        F.col(addr).isin(list(owners))
    )
