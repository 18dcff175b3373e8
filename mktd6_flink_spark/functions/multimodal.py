"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, plus decode / feature-extract / resize /
frame-sample operators as Arrow-batched pandas functions over
``mapInPandas``.

The actual codecs (PIL/ffmpeg/etc.) are NOT available in this container, so
the decode step is STUBBED: ``decode_media`` raises NotImplementedError
unless ``fake=True``, in which case it produces a deterministic fake decode
(dimensions derived from the payload hash) so the Spark-side plumbing —
schema, batch iteration, partitioning, UDF signatures — is real and
testable end to end.

Scale notes: media payloads are large blobs; the operators below keep them
out of shuffles (metadata-only projections shuffle, payloads stay in their
input partition via mapInPandas), and ``maxRecordsPerBatch`` bounds Arrow
batch memory. At 100 TB, store payloads in parquet binary columns (or
pointers into object storage) and push decode to the executors exactly as
mapInPandas does here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .hashing import round_portable
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Typed metadata carried alongside every opaque payload.
MEDIA_META = StructType([
    StructField("format", StringType()),       # e.g. "png", "wav", "mp4"
    StructField("width", IntegerType()),       # images/video
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),    # audio/video
    StructField("n_bytes", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),         # "image" | "audio" | "video"
    StructField("payload", BinaryType()),
    StructField("meta", MEDIA_META),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])

N_FEATURES = 8


def fake_media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table with real binary payloads (the utf-8 document
    bytes) and typed metadata — the deterministic stand-in for a real
    image/audio ingest. Pure Column expressions."""
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(payload).cast("long")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/" + kind).alias("format"),
            (n_bytes % 640 + 16).cast("int").alias("width"),
            (n_bytes % 480 + 16).cast("int").alias("height"),
            (n_bytes * 10).alias("duration_ms"),
            n_bytes.alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = False,
                 batch_size_hint: int | None = None) -> DataFrame:
    """Decode payloads and extract per-item features via ``mapInPandas``.

    Real decode is STUBBED (no codec libs in this environment): with
    ``fake=False`` this raises NotImplementedError at execution time; with
    ``fake=True`` it derives deterministic pseudo-decode outputs from the
    payload bytes, exercising the full Arrow batch path: binary in,
    struct+array<float> out, payloads never shuffled.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            out_rows = []
            for row in pdf.to_dict("records"):
                payload: bytes = bytes(row["payload"])
                n = len(payload)
                # Deterministic fake decode: dims from byte stats, features
                # from fixed-stride byte windows (real arithmetic over the
                # real bytes — only the *codec* is fake).
                width = n % 640 + 16
                height = n % 480 + 16
                n_frames = 1 if row["kind"] == "image" else n % 16 + 1
                stride = max(n // N_FEATURES, 1)
                feats = [
                    float(sum(payload[i * stride:(i + 1) * stride])
                          % 1000) / 1000.0
                    for i in range(N_FEATURES)
                ]
                out_rows.append((row["media_id"], row["kind"], width, height,
                                 n_frames, feats))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "kind", "width", "height", "n_frames",
                         "features"],
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_meta(media: DataFrame, max_side: int) -> Column | DataFrame:
    """Resize planning as a metadata-only projection (the payload transform
    itself would live in the decode stub): compute the scaled dims keeping
    aspect ratio. Pure Column math — no Python, no payload movement."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / F.greatest(w, h), F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        F.floor(w * scale + F.lit(0.5)).cast("int").alias("out_width"),
        F.floor(h * scale + F.lit(0.5)).cast("int").alias("out_height"),
        round_portable(scale).alias("scale"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video rows: one row per sampled timestamp
    (explode over a sequence — JVM-side; the actual frame grab would happen
    in the decode stub)."""
    n = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.when(n >= 1, F.sequence(F.lit(0), n - 1))
                .otherwise(F.array().cast("array<int>"))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx").cast("long") * every_ms).alias("sample_at_ms"),
        )
    )
