"""Multimodal (image/audio/video) column support.

Design (per the 100 TB training-pipeline brief): media travels as an
opaque ``binary`` payload column + typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.  The real codec libraries are
not in this container, so the decode kernel is STUBBED — but the
Spark-side plumbing (schema, partition-preserving mapInPandas, batch
shape, deterministic feature contract) is real and tested:

- ``MEDIA_SCHEMA``: the media table layout
- ``synthesize_media``: builds a media table from any text corpus
  (payload = utf-8 bytes) so the pipeline is exercisable here
- ``extract_features``: mapInPandas feature stage.  Features are
  computed from the payload bytes deterministically (hashlib), so the
  whole Python path is oracle-checkable; the *actual* pixel/sample
  decode raises NotImplementedError behind ``decode_real``.

At scale: payloads stay columnar (parquet binary), mapInPandas
processes ~batch_size rows per Arrow batch per partition, and nothing
ever collects to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "MEDIA_KINDS",
    "synthesize_media",
    "extract_features",
    "extract_features_arrow",
    "decode_real",
]

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        # deterministic fake decode outputs (width/height for image,
        # sample_rate/duration surrogate for audio/video)
        T.StructField("dim_a", T.IntegerType(), False),
        T.StructField("dim_b", T.IntegerType(), False),
    ]
)


def decode_real(payload: bytes, kind: str):  # pragma: no cover - by design
    """Real media decode — requires PIL/librosa/ffmpeg, absent here."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; the deterministic stub in extract_features models "
        "the batch shape and schema of the real kernel"
    )


def _fake_dims(digest_hex: str, kind: str) -> tuple[int, int]:
    """Deterministic pseudo-decode: dims derived from the content hash.

    Mirrors what a real decoder would attach, with a closed-form
    definition reproducible in SQL: dim_a = h[:4] as int % 1920,
    dim_b = h[4:8] as int % 1080."""
    a = int(digest_hex[:4], 16) % 1920
    b = int(digest_hex[4:8], 16) % 1080
    return a, b


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents -> media table: payload = utf-8 bytes of the text,
    kind round-robined over MEDIA_KINDS.  Stand-in source so the whole
    media pipeline runs on the driver corpus."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas keeps partitioning intact (no shuffle) and streams
    Arrow batches through pandas — the pattern a real decode/resize/
    frame-sample kernel plugs into.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )
            dims = out["digest"].map(lambda h: _fake_dims(h, ""))
            out["dim_a"] = dims.map(lambda t: t[0]).astype("int32")
            out["dim_b"] = dims.map(lambda t: t[1]).astype("int32")
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("src_dim_a", T.IntegerType(), False),
        T.StructField("src_dim_b", T.IntegerType(), False),
        T.StructField("dst_dim_a", T.IntegerType(), False),
        T.StructField("dst_dim_b", T.IntegerType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_digest", T.StringType(), False),
    ]
)


def resize_media(media: DataFrame, dst_a: int, dst_b: int, batch_size: int = 256) -> DataFrame:
    """mapInPandas resize stage (1:1 rows, payload rewritten).

    The pixel resample itself is behind ``decode_real`` (absent codecs),
    so the stub emits a deterministic surrogate payload — the md5 chain
    of (digest, dst dims), length proportional to the target area — while
    the batch shape, schema, and partition behavior match the real
    kernel exactly.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = digests.map(lambda h: _fake_dims(h, ""))
            surrogate = digests.map(
                lambda h: hashlib.md5(f"{h}:{dst_a}x{dst_b}".encode()).digest()
                * max(1, (dst_a * dst_b) // 10_000)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": surrogate,
                    "src_dim_a": dims.map(lambda t: t[0]).astype("int32"),
                    "src_dim_b": dims.map(lambda t: t[1]).astype("int32"),
                    "dst_dim_a": pd.Series([dst_a] * len(pdf)).astype("int32"),
                    "dst_dim_b": pd.Series([dst_b] * len(pdf)).astype("int32"),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """mapInPandas frame-sampling stage (1:N fan-out for videos).

    A video's frame count is derived deterministically from its content
    hash (h[8:12] % 300, the decode stub's contract); every ``every_n``-th
    frame becomes an output row.  Non-video rows are dropped.  This is
    the flatMap-shaped pandas stage a real ffmpeg frame extractor plugs
    into — fan-out happens inside the Arrow batch, no shuffle.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if not len(vids):
                continue
            ids, idxs, digs = [], [], []
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                n_frames = int(h[8:12], 16) % 300
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    digs.append(hashlib.md5(f"{h}:frame:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_digest": pd.Series(digs, dtype="object"),
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of ``extract_features``: RecordBatches in,
    RecordBatches out, no pandas materialization.

    The Arrow-native path saves the per-batch Arrow->pandas->Arrow
    conversion (the only per-row Python left is the digest itself,
    which a real kernel would replace with the decode call).  Output
    is bit-identical to the mapInPandas stage — pinned by
    ``tests/test_multimodal.py`` and by the shared SQL oracle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def _extract(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            digests = [
                hashlib.md5(v.as_py()).hexdigest() if v.is_valid else None
                for v in payloads
            ]
            dim_a = [
                int(h[:4], 16) % 1920 if h is not None else None for h in digests
            ]
            dim_b = [
                int(h[4:8], 16) % 1080 if h is not None else None for h in digests
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("kind")),
                    pc.cast(pc.binary_length(payloads), pa.int32()),
                    pa.array(digests, pa.string()),
                    pa.array(dim_a, pa.int32()),
                    pa.array(dim_b, pa.int32()),
                ],
                names=["media_id", "kind", "n_bytes", "digest", "dim_a", "dim_b"],
            )

    return media.mapInArrow(_extract, schema=FEATURE_SCHEMA)
