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


# -- frame sampling (1:N fan-out inside the Arrow batch) --------------------

_FRAMES_ORACLE = """
WITH v AS (
  SELECT doc_id AS media_id, md5(text) AS h
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT media_id, h,
         unnest(generate_series(0, ('0x' || substr(h, 9, 4))::INT % 300 - 1, 10))
           AS frame_idx
  FROM v
  WHERE ('0x' || substr(h, 9, 4))::INT % 300 > 0
)
SELECT media_id, frame_idx,
       md5(h || ':frame:' || frame_idx) AS frame_digest
FROM f
"""


@register(
    "media_frame_sample",
    _FRAMES_ORACLE,
    doc="multimodal: every-10th-frame sampling of videos — the "
    "flatMap-shaped mapInPandas stage (fan-out inside the Arrow batch, "
    "no shuffle); stub frame count/digests are closed-form, so the "
    "Python path is value-hash-checked end to end",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synthesize_media(docs), every_n=10)


# -- resize audit (1:1 payload rewrite) -------------------------------------

_DST_A, _DST_B = 640, 360

_RESIZE_ORACLE = f"""
SELECT doc_id AS media_id,
       ['image','audio','video'][(doc_id % 3) + 1] AS kind,
       CAST(('0x' || substr(md5(text), 1, 4))::INT % 1920 AS INT) AS src_dim_a,
       CAST(('0x' || substr(md5(text), 5, 4))::INT % 1080 AS INT) AS src_dim_b,
       {_DST_A} AS dst_dim_a, {_DST_B} AS dst_dim_b,
       CAST(16 * greatest(1, ({_DST_A} * {_DST_B}) // 10000) AS BIGINT)
         AS n_bytes
FROM documents
"""


@register(
    "media_resize_audit",
    _RESIZE_ORACLE,
    doc=f"multimodal: resize-to-{_DST_A}x{_DST_B} stage audit — emits the "
    "metadata row of the mapInPandas payload rewrite (surrogate payload "
    "size is closed-form, so the 1:1 Arrow stage is driver-checked)",
)
def q_media_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(synthesize_media(docs), _DST_A, _DST_B)
    return resized.select(
        "media_id",
        "kind",
        "src_dim_a",
        "src_dim_b",
        F.col("dst_dim_a").cast("int").alias("dst_dim_a"),
        F.col("dst_dim_b").cast("int").alias("dst_dim_b"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


@register(
    "media_features_arrow",
    _MEDIA_ORACLE,
    doc="mapInArrow twin of media_features: RecordBatch-native feature "
    "extraction, no pandas round-trip — same oracle, same output, "
    "lower per-batch overhead (the preferred 100 TB shape for kernels "
    "that work on buffers, not frames)",
)
def q_media_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.multimodal import extract_features_arrow

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features_arrow(synthesize_media(docs))
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "digest",
        F.col("dim_a").cast("long").alias("dim_a"),
        F.col("dim_b").cast("long").alias("dim_b"),
    )
