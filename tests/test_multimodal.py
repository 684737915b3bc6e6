from __future__ import annotations

import pytest

from huracan_spark.multimodal import (
    FEATURE_SCHEMA,
    decode_real,
    extract_features,
    synthesize_media,
)
from huracan_spark.sources.tables import load_table


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG", "image")


def test_media_pipeline_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.kind in ("image", "audio", "video")
        assert 0 <= r.dim_a < 1920 and 0 <= r.dim_b < 1080
        assert len(r.digest) == 32 and r.n_bytes > 0


def test_media_partitioning_preserved(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").repartition(4)
    feats = extract_features(synthesize_media(docs))
    # mapInPandas must not shuffle: same partition count as input
    assert feats.rdd.getNumPartitions() == 4
