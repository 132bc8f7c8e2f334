"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct.
Decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` — the Spark-side plumbing
(schema, partition sizing, batch shape) is real and tested; the actual
codec calls are STUBBED (the image/audio libraries are not available
in this environment) behind ``decode_image``'s deterministic fake and
a clearly-marked NotImplementedError for real decoding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# Typed metadata for a media column: content plus shape/codec info.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("codec", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("byte_entropy", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

REAL_DECODE = False  # flip when PIL/librosa/ffmpeg are available


def decode_image(content: bytes) -> "object":
    """Real image decode — unavailable in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg; not installed here. "
        "The mapInPandas plumbing below uses a deterministic fake.")


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector:
    per-stride byte sums. Replaces the codec call, keeps the batch
    shape and schema of the real pipeline. Accumulation is exact
    integer math with a single final division, so the value is
    reproducible bit-for-bit by any engine (no FP summation-order
    dependence) — the SQL oracle mirrors it.
    """
    if content is None or len(content) == 0:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(content):
        acc[i % dim] += byte
    n = max(1, len(content) // dim)
    return [round(a / 255.0 / n, 6) for a in acc]


def _entropy(content: bytes) -> float:
    import math

    if not content:
        return 0.0
    counts: dict[int, int] = {}
    for byte in content:
        counts[byte] = counts.get(byte, 0) + 1
    n = len(content)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def extract_image_features(media: DataFrame,
                           batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    At scale: binary payloads dominate partition size, so repartition
    by bytes not rows before heavy decode (maxPartitionBytes governs the
    scan; an explicit repartition evens out skewed media sizes).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(
                    lambda b: 0 if b is None else len(b)),
                "byte_entropy": pdf["content"].map(_entropy),
                "feature": pdf["content"].map(_fake_features),
            })
            yield out

    return media.select("media_id", "content").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The frame *extraction* is stubbed (no ffmpeg); the row expansion —
    the part that matters for partitioning math — is a real
    explode(sequence(...)) sized by duration metadata, so planners see
    true output cardinality.
    """
    n = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))))
        .withColumn("frame_ts_ms", F.col("frame_ts_ms") * every_ms)
        .withColumn("frame", F.lit(None).cast("binary"))  # stub: no ffmpeg
        .select("media_id", "frame_ts_ms", "frame")
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        content = bytes((i * 31 + j * 7) % 256 for j in range(128 + i))
        rows.append((i, content, "image" if i % 2 == 0 else "video",
                     "fake", 64, 64, 5000 if i % 2 else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
