"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

BASELINE.json north-star extension. The engine treats media as
``binary`` payload columns with a typed metadata struct; the Spark-side
plumbing (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested, while the actual codec work is stubbed: the image/audio
libraries are not in this container, so ``decode_*`` raise
``NotImplementedError`` unless ``fake=True``, which produces deterministic
hash-derived pseudo-decodes (stable across runs and engines) so downstream
operators can be exercised end-to-end.

Scale notes:
- media rows are large → ``mapInPandas`` with Arrow batches keeps transfer
  vectorized; ``spark.sql.files.maxPartitionBytes`` bounds task memory on
  the binaryFile read; never groupBy on payload bytes (hash the payload
  first — ``blob_meta`` adds the content sha).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, content_sha string, width int, height int, channels int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_index int, frame_sha string"

_IMAGE_LIBS_AVAILABLE = False
try:  # pragma: no cover - not in this container
    import PIL.Image  # noqa: F401

    _IMAGE_LIBS_AVAILABLE = True
except ImportError:
    pass


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """Ingest raw media files: Spark's binaryFile source.

    Columns: path, modificationTime, length, content (binary). Pushdown:
    ``pathGlobFilter`` prunes at listing time, like the reference's suffix
    filter (BlobSources/ListBlobSource.cs:35).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def attach_blob(df: DataFrame, src_col: str, blob_col: str = "blob") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of a string column,
    or pass-through if already binary) — used by tests to fabricate media
    payloads from the documents table."""
    c = F.col(src_col)
    return df.withColumn(blob_col, F.encode(c.cast("string"), "UTF-8"))


def blob_meta(df: DataFrame, blob_col: str = "blob", media_type: str = "application/octet-stream") -> DataFrame:
    """Typed metadata struct for a binary column: content sha256, size,
    declared media type. Pure built-ins (sha2/octet_length) — no UDF."""
    b = F.col(blob_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.sha2(b, 256).alias("content_sha"),
            F.octet_length(b).cast("long").alias("n_bytes"),
            F.lit(media_type).alias("media_type"),
        ),
    )


def decode_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode images and extract a feature vector per image.

    Real decode requires PIL/libvips (absent here) → NotImplementedError.
    ``fake=True``: deterministic pseudo-decode — dimensions and features
    derived from the payload's sha256 bytes, so the full Arrow/mapInPandas
    plumbing (batch iteration, schema, partition shape) runs for real.
    """
    if not fake and not _IMAGE_LIBS_AVAILABLE:
        raise NotImplementedError(
            "image decode requires PIL/libvips (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                digest = hashlib.sha256(bytes(blob)).digest()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "content_sha": hashlib.sha256(bytes(blob)).hexdigest(),
                        "width": 16 + digest[0],
                        "height": 16 + digest[1],
                        "channels": 3,
                        "feature": [digest[2 + j] / 255.0 for j in range(feature_dim)],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    every_n: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Sample video frames every ``every_n`` frames.

    Real decode needs ffmpeg/pyav (absent) → NotImplementedError unless
    ``fake=True`` (frames = fixed-size byte windows of the payload;
    deterministic). One output row per sampled frame.
    """
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg/pyav (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                frame_size = 32
                n_frames = max(len(raw) // frame_size, 1)
                for fi in range(0, n_frames, every_n):
                    chunk = raw[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_index": fi,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, resized binary"

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, content_sha string, sample_rate int, n_samples long, "
    "duration_s double, feature array<float>"
)


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize images to ``width``×``height``, emitting a new binary payload.

    Real resample needs PIL/libvips (absent here) → NotImplementedError
    unless ``fake=True``: the stub emits a deterministic payload of exactly
    ``width*height*3`` bytes derived by cycling the source sha256 digest,
    so output size, schema, and Arrow batch shape behave like a real
    resize. mapInPandas keeps payload transfer Arrow-batched; output rows
    are wider than input metadata rows, so keep
    ``spark.sql.files.maxPartitionBytes`` sized for decoded (not encoded)
    bytes when chaining real codecs.
    """
    if not fake and not _IMAGE_LIBS_AVAILABLE:
        raise NotImplementedError(
            "image resize requires PIL/libvips (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    n_out = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                digest = hashlib.sha256(bytes(blob)).digest()
                payload = (digest * (n_out // len(digest) + 1))[:n_out]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": width,
                        "height": height,
                        "resized": payload,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(batches, RESIZE_SCHEMA)


def decode_audio_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    fake: bool = False,
    feature_dim: int = 8,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Decode audio and extract a per-clip feature vector.

    Real decode needs soundfile/ffmpeg (absent here) → NotImplementedError
    unless ``fake=True``: duration/sample counts derive from payload size
    (1 pseudo-sample per payload byte) and features from the sha256
    digest, deterministic across runs and engines.
    """
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                digest = hashlib.sha256(raw).digest()
                n_samples = len(raw)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "content_sha": hashlib.sha256(raw).hexdigest(),
                        "sample_rate": sample_rate,
                        "n_samples": n_samples,
                        "duration_s": n_samples / sample_rate,
                        "feature": [digest[j] / 255.0 for j in range(feature_dim)],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
