"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs via mapInPandas. The decode kernels are STUBBED (codec libraries
are not in this container — see `decode_image`), but the Spark-side plumbing
(schemas, batch iteration, partitioning, UDF signatures) is real and tested.

Schema convention:
  media(media_id long, kind string, payload binary,
        meta struct<mime:string, width:int, height:int, duration_ms:long>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation decodes via PIL/libvips (not in container).

    The deterministic fake below lets the pipeline run end-to-end: callers
    that need pixels get a NotImplementedError; callers that need features
    use `extract_features` (which uses the payload-hash fake)."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not available in this container"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of sha256(payload) scaled to
    [0,1). Replaced by a real encoder at deploy time; keeps shapes/joins
    exercised in tests."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    Batch shape: mapInPandas streams Arrow record batches; payload bytes stay
    off the JVM heap. At scale, repartition upstream so batches are
    ~10-100 MB of payloads (spark.sql.execution.arrow.maxRecordsPerBatch
    bounds rows; payload size governs memory)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(
                        [len(p or b"") for p in payloads], dtype="int32"
                    ),
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _extract, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) to
    decode — pure DataFrame math from metadata, no codec needed. The decode
    itself would be a mapInPandas over this plan joined back to payloads."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
