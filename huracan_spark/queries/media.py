"""Multimodal pipeline query: the mapInPandas feature-extract stage,
oracle-checked because the stub decoder is deterministic (content-hash
derived).  This validates the Python/Arrow path itself — schema, batch
shape, byte handling — against a pure-SQL reconstruction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.multimodal import extract_features, synthesize_media
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

_MEDIA_ORACLE = """
SELECT doc_id AS media_id,
       ['image','audio','video'][(doc_id % 3) + 1] AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(('0x' || substr(md5(text), 1, 4))::INT % 1920 AS BIGINT) AS dim_a,
       CAST(('0x' || substr(md5(text), 5, 4))::INT % 1080 AS BIGINT) AS dim_b
FROM documents
"""


@register(
    "media_features",
    _MEDIA_ORACLE,
    doc="multimodal: binary payload -> mapInPandas feature extraction (stub decode)",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "digest",
        F.col("dim_a").cast("long").alias("dim_a"),
        F.col("dim_b").cast("long").alias("dim_b"),
    )
