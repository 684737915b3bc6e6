"""Object query API: the GraphQL resolver surface over the silver table.

Port of ``QueryRoot::object`` / ``QueryRoot::objects`` /
``dynamic_fields`` (server/src/main.rs:271-347, 203-247): each GraphQL
argument pattern compiles to a DataFrame plan against the silver
current-state table.  First-match-wins priority is the reference's:
ids > owner > owners > type > types > dynamic_field, else InvalidQuery
(server/src/main.rs:281-343).

Fixes carried over from SURVEY §4.3 (deliberate non-replication of
bugs): pagination is always ordered by ``_id``; dynamic-field
expansion is a single join, not N+1 per-parent queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from huracan_spark.functions.owner import owned_by, owned_by_any
from huracan_spark.functions.typeparse import type_generics
from huracan_spark.operators.pagination import paginate

__all__ = ["ObjectsQuery", "InvalidQuery", "ObjectsApi", "DYNFIELD_PREFIX"]

DYNFIELD_PREFIX = "0x2::dynamic_field::Field<"


class InvalidQuery(ValueError):
    """No recognized argument pattern (server/src/main.rs:341-343)."""


@dataclass
class ObjectsQuery:
    ids: list[str] | None = None
    owner: str | None = None
    owners: list[str] | None = None
    type_: str | None = None
    types: list[str] | None = None
    dynamic_field_value: str | None = None
    dynamic_field_value_path: str = "$.value"
    dynamic_field_keys: list[str] | None = None
    limit: int = 50
    skip: int = 0


@dataclass
class ObjectsApi:
    silver: DataFrame
    include_tombstones: bool = False

    def _base(self) -> DataFrame:
        df = self.silver
        if not self.include_tombstones:
            df = df.filter(~F.col("deleted"))
        return df

    # Q1: point lookup
    def object(self, object_id: str) -> DataFrame:
        return self._base().filter(F.col("_id") == object_id).limit(1)

    # Q2-Q8 dispatch, reference priority order
    def objects(self, q: ObjectsQuery) -> DataFrame:
        base = self._base()
        if q.ids:
            out = base.filter(F.col("_id").isin(q.ids))
        elif q.owner:
            out = base.filter(owned_by(q.owner))
        elif q.owners:
            out = base.filter(owned_by_any(q.owners))
        elif q.type_:
            out = base.filter(F.col("object_type").startswith(q.type_))
        elif q.types:
            pred: Column = F.lit(False)
            for t in q.types:
                pred = pred | F.col("object_type").startswith(t)
            out = base.filter(pred)
        elif q.dynamic_field_value is not None:
            out = self._dynamic_field_parents(q)
        else:
            raise InvalidQuery("no filter pattern supplied")
        return paginate(out, "_id", limit=q.limit, offset=q.skip)

    def _dynamic_field_parents(self, q: ObjectsQuery) -> DataFrame:
        """Q7 (server/src/main.rs:295-340): find dynamic-field objects
        whose value (at a runtime-built JSON path) matches, then join
        field -> parent via owner_address = parent._id and return the
        parents ($lookup + $replaceWith parent)."""
        base = self._base()
        fields = base.filter(F.col("object_type").startswith(DYNFIELD_PREFIX))
        val = F.get_json_object(F.col("fields_json"), q.dynamic_field_value_path)
        fields = fields.filter(val == q.dynamic_field_value)
        if q.dynamic_field_keys:
            key = F.get_json_object(F.col("fields_json"), "$.name")
            fields = fields.filter(key.isin(q.dynamic_field_keys))
        parents = base.alias("p")
        return (
            fields.alias("f")
            .join(parents, F.col("f.owner_address") == F.col("p._id"), "inner")
            .select("p.*")
        )

    # Q8: dynamic_fields child expansion — one join for ALL parents
    # (fixes the reference's N+1, server/src/main.rs:203-247)
    def dynamic_fields(
        self, parent_ids: list[str] | None = None, limit: int = 50, skip: int = 0
    ) -> DataFrame:
        base = self._base()
        fields = base.filter(F.col("object_type").startswith(DYNFIELD_PREFIX))
        if parent_ids is not None:
            fields = fields.filter(F.col("owner_address").isin(parent_ids))
        gens = type_generics("object_type")
        out = fields.select(
            F.col("owner_address").alias("parent_id"),
            F.col("_id").alias("field_id"),
            gens.getItem(0).alias("key_type"),
            gens.getItem(1).alias("value_type"),
            F.get_json_object("fields_json", "$.name").alias("key"),
            F.get_json_object("fields_json", "$.value").alias("value_json"),
        )
        return paginate(out, ["parent_id", "field_id"], limit=limit, offset=skip)
