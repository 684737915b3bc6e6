"""The reference's example-queries/ corpus, file by file.

SURVEY §5 identifies `example-queries/` as the de-facto acceptance
suite — the queries the system is documented to answer. This module
walks that corpus explicitly so parity is checkable one file at a
time:

- graphql/get-object-by-id.graphql        -> ObjectsApi.object
- graphql/get-objects-by-owner.graphql    -> ObjectsApi.objects(owner)
- graphql/get-objects-by-type.graphql     -> ObjectsApi.objects(type_)
- mongodb/estimated-document-count.txt    -> q: estimated_count (A1)
- mongodb/get-count-of-documents-per-type -> q: count_per_type (A2)
- mongodb/get-count-of-unique-types.txt   -> q: distinct_types (A3)
- mongodb/get-distinct-object-types-by-owner -> q: distinct_types_by_owner (A4)
- mongodb/get-distinct-types.txt          -> q: distinct_types (A5)
- mongodb/get-largest-document-size.txt   -> q: max_doc_size (A6)
- mongodb/get-obj-by-owner.txt            -> q: owner_lookup (A8)

The Mongo analytics entries are DuckDB-oracle-checked by the driver
(CORRECTNESS gate); here we assert the registry mapping exists and the
GraphQL argument patterns return exactly the rows + projections the
.graphql documents select (type.full / id / owner / fields).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from huracan_spark.api import ObjectsApi, ObjectsQuery
from huracan_spark.pipeline.backfill import run_backfill
from huracan_spark.pipeline.fixtures import FixtureConfig, generate
from huracan_spark.pipeline.silver import SilverTable


@pytest.fixture(scope="module")
def silver_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus-fixtures")
    generate(str(d), FixtureConfig(seed=7, n_objects=500, n_checkpoints=90))
    silver = SilverTable(spark, str(d / "silver"), n_buckets=4)
    run_backfill(
        spark,
        spark.read.parquet(f"{d}/object_changes.parquet"),
        spark.read.parquet(f"{d}/objects_content.parquet"),
        silver,
    )
    return silver.read().cache()


@pytest.fixture(scope="module")
def api(silver_df):
    return ObjectsApi(silver_df)


def test_graphql_get_object_by_id(api, silver_df):
    """get-object-by-id.graphql: object(id) { type { full } fields owner }"""
    some_id = silver_df.filter(~F.col("deleted")).select("_id").first()._id
    out = api.object(some_id)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]._id == some_id
    # the projection the document selects is servable
    proj = out.select("object_type", "fields_json", "owner_kind", "owner_address")
    assert proj.count() == 1


def test_graphql_get_objects_by_owner(api, silver_df):
    """get-objects-by-owner.graphql: objects(owner) { type { full } id }"""
    owner = (
        silver_df.filter(F.col("owner_address").isNotNull())
        .select("owner_address")
        .first()
        .owner_address
    )
    got = {r._id for r in api.objects(ObjectsQuery(owner=owner, limit=1000)).collect()}
    want = {
        r._id
        for r in silver_df.filter(
            ~F.col("deleted")
            & (F.col("owner_address") == owner)
            & F.col("owner_kind").isin("AddressOwner", "ObjectOwner")
        ).collect()
    }
    assert got == want and len(want) > 0


def test_graphql_get_objects_by_type(api, silver_df):
    """get-objects-by-type.graphql: objects(type) { id owner } — prefix
    semantics: package, pkg::mod, pkg::mod::Struct all match."""
    full_type = (
        silver_df.filter(F.col("object_type").isNotNull())
        .select("object_type")
        .first()
        .object_type
    )
    package = full_type.split("::")[0]
    for ty in (package, full_type):
        got = {r._id for r in api.objects(ObjectsQuery(type_=ty, limit=1000)).collect()}
        want = {
            r._id
            for r in silver_df.filter(
                ~F.col("deleted") & F.col("object_type").startswith(ty)
            ).collect()
        }
        assert got == want and len(want) > 0


_MONGO_CORPUS_TO_QUERY = {
    "estimated-document-count.txt": "estimated_count",
    "get-count-of-documents-per-type.txt": "count_per_type",
    "get-count-of-unique-types.txt": "distinct_types",
    "get-distinct-object-types-by-owner.txt": "distinct_types_by_owner",
    "get-distinct-types.txt": "distinct_types",
    "get-largest-document-size.txt": "max_doc_size",
    "get-obj-by-owner.txt": "owner_lookup",
}


@pytest.mark.parametrize("corpus_file,qname", sorted(_MONGO_CORPUS_TO_QUERY.items()))
def test_mongo_corpus_mapped_and_runnable(spark, sf_dir, corpus_file, qname):
    """Every raw-Mongo example maps to a registered, oracle-checked
    query (the driver hash-matches them; here: mapping + executability)."""
    from huracan_spark.queries.registry import REGISTRY, spark_queries

    spark_queries()
    assert qname in REGISTRY, f"{corpus_file} lost its mapping"
    assert REGISTRY[qname].oracle is not None  # oracle-checked, not rows-only
    assert REGISTRY[qname].fn(spark, sf_dir).count() >= 0
