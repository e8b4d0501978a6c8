"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side design is real and tested — schema contracts, Arrow-batched
``mapInPandas`` signatures, partition-size control — while the actual media
decode is stubbed (image/audio libs are not in this container): a
deterministic fake "decode" derives features from the payload bytes so the
full pipeline is exercisable end-to-end.  Swap ``_decode_stub`` for a real
decoder (PIL/torchaudio/ffmpeg) in production; nothing else changes.

Scale notes:
- media rows are wide (MBs): ``repartition`` by byte budget before the decode
  stage so one Arrow batch stays in worker memory
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows per batch).
- decode is ``mapInPandas`` (iterator form) so a partition streams through in
  batches instead of materializing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for pipeline tests (payload bytes are a
    function of media_id)."""
    rows = [
        (
            i,
            kind,
            bytes(((i * 31 + j * 7) % 251) for j in range(128 + (i % 32))),
            f"{kind}/fake",
            64 + i % 16,
            48 + i % 12,
            1000 + i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_stub(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic fake feature extraction (stands in for a real decoder).

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB").resize(...)
        feature = model(img)

    which is unavailable here; raise-for-real behavior is provided by
    ``decode_features(..., strict=True)``."""
    if payload is None:
        return None
    acc = [0.0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += float(b)
    norm = max(sum(x * x for x in acc) ** 0.5, 1e-12)
    return [round(x / norm, 6) for x in acc]


def decode_features(
    df: DataFrame, dim: int = 8, batch_rows: int = 256, strict: bool = False
) -> DataFrame:
    """media table → (media_id, n_bytes, feature[dim]) via mapInPandas.

    ``strict=True`` raises NotImplementedError where a real decoder is
    required, making the stub boundary explicit."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if strict:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/ffmpeg, not present "
                "in this environment; use strict=False for the deterministic stub"
            )
        for batch in batches:
            payloads = batch["payload"]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": payloads.map(lambda p: _decode_stub(p, dim)),
                }
            )

    narrowed = df.select("media_id", "payload")
    return narrowed.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).
    The frame extraction itself is the stubbed decode; the row fan-out and
    timestamp arithmetic are real Spark (sequence + explode, no Python)."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image resize stage: (media_id, new dims, resized payload).

    The resize kernel is stubbed (deterministic byte down/up-sampling standing
    in for ``PIL.Image.resize``); the Spark plumbing — binary in/out schema,
    iterator ``mapInPandas`` batching, metadata rewrite — is the production
    shape.  ``strict=True`` raises at the stub boundary."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if strict:
            raise NotImplementedError(
                "real image resize requires PIL, not present in this "
                "environment; use strict=False for the deterministic stub"
            )
        target_len = target_width * target_height // 64  # fake byte budget

        def stub_resize(p):
            if p is None:
                return None
            if len(p) >= target_len:
                return bytes(p[:target_len])
            return bytes((p * (target_len // max(len(p), 1) + 1))[:target_len])

        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": target_width,
                    "height": target_height,
                    "payload": batch["payload"].map(stub_resize),
                }
            )

    return df.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(resize, schema=RESIZED_SCHEMA)
