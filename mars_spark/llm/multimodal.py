"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested: schema conventions, Arrow
batch shape, mapInPandas signatures, partition sizing. The actual codec
work (PIL/ffmpeg/torchaudio) is stubbed behind DECODERS — those libs
aren't in this container — with a deterministic fake so pipelines are
testable end-to-end. Swap the stub for a real decoder without touching
any Spark code.

Schema convention for a multimodal table::

    id bigint, modality string, content binary, meta map<string,string>

Design-for-scale notes: decode runs in mapInPandas with small Arrow
batches (binary payloads are big — cap maxRecordsPerBatch accordingly);
feature outputs are fixed-size float arrays so downstream similarity
ops reuse llm.similarity unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, MapType, StringType,
    StructField, StructType,
)

MULTIMODAL_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("modality", StringType()),
    StructField("content", BinaryType()),
    StructField("meta", MapType(StringType(), StringType())),
])

FEATURE_DIM = 32


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature
    vector. REPLACE with PIL/ffmpeg/torchaudio in production — the
    surrounding Spark plumbing does not change."""
    import hashlib

    seed = int(hashlib.md5(payload or b"").hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


DECODERS = {
    "image": _fake_decode,   # stub: real impl = PIL.Image.open + resize + CNN
    "audio": _fake_decode,   # stub: real impl = torchaudio.load + mel features
    "video": _fake_decode,   # stub: real impl = frame-sample + per-frame image path
}


def decode_features(sdf: SparkDF, content_col: str = "content",
                    modality_col: str = "modality",
                    out_col: str = "features") -> SparkDF:
    """binary content → fixed-size float feature vector via mapInPandas.

    Arrow-batched; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (keep small for large
    payloads). Output schema = input + features array<float>.
    """
    out_schema = StructType(
        sdf.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(m, _fake_decode)(c, m).tolist()
                for c, m in zip(pdf[content_col], pdf[modality_col])
            ]
            pdf[out_col] = feats
            yield pdf

    return sdf.mapInPandas(_decode, schema=out_schema)


def frame_sample_plan(sdf: SparkDF, every_n: int = 30) -> SparkDF:
    """Video frame-sampling *plan*: one output row per sampled frame
    index, derived from meta['n_frames']. The decode of each frame is
    the stubbed DECODERS['video'] path. Demonstrates the explode-based
    fan-out shape a real video pipeline uses (row count multiplies, so
    repartition after)."""
    n = F.coalesce(F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return sdf.withColumn("frame_idx", F.explode(idx))


def resize_meta(sdf: SparkDF, width: int, height: int) -> SparkDF:
    """Record target dims in meta; actual pixel work happens in the
    (stubbed) decoder. Keeps the transform declarative/plannable."""
    return sdf.withColumn(
        "meta",
        F.map_concat(
            F.col("meta"),
            F.create_map(F.lit("resize"), F.lit(f"{width}x{height}")),
        ),
    )


def synthetic_multimodal(spark, n: int = 100, seed: int = 42) -> SparkDF:
    """Deterministic fake multimodal table for tests (no codec libs in
    the container)."""
    rows = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.concat(F.lit(f"payload-{seed}-"), F.col("id")), "utf-8")
        .alias("content"),
        F.create_map(
            F.lit("n_frames"), (F.col("id") % 120 + 1).cast("string")
        ).alias("meta"),
    )
    return rows
