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


SPPM_MAGIC = b"SPPM"  # deterministic test codec: magic + w:u16 + h:u16 + c:u8


def encode_sppm(pixels) -> bytes:
    """Encode an (h, w, c) uint8 numpy array in the SPPM fake format —
    the deterministic stand-in for jpeg/png in this container (the real
    deploy swaps decode_image's body for PIL/libvips; every signature,
    batch shape, and join stays identical)."""
    import numpy as np
    import struct

    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    return SPPM_MAGIC + struct.pack("<HHB", w, h, c) + a.tobytes()


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, c) uint8 array.

    SPPM payloads (the deterministic fake) decode for real; genuine codec
    formats raise NotImplementedError because PIL/libvips are not in this
    container — the error names the swap point, it is not a silent fallback.
    """
    import numpy as np
    import struct

    if payload is None or len(payload) < 9:
        raise ValueError("not an image payload")
    if payload[:4] == SPPM_MAGIC:
        w, h, c = struct.unpack("<HHB", payload[4:9])
        a = np.frombuffer(payload, dtype=np.uint8, offset=9)
        if a.size != w * h * c:
            raise ValueError("truncated SPPM payload")
        return a.reshape(h, w, c)
    raise NotImplementedError(
        "real codec formats (jpeg/png/...) require PIL/libvips, not in this "
        "container — swap decode_image's body at deploy time"
    )


def resize_nearest(pixels, out_w: int, out_h: int):
    """Nearest-neighbor resize, pure numpy (the vectorized kernel a real
    resize would replace with PIL/opencv)."""
    import numpy as np

    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pixels[ys][:, xs]


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.ArrayType(T.DoubleType())),
        T.StructField("resized", T.BinaryType()),
    ]
)


def decode_and_resize(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Decode -> per-channel mean -> nearest resize -> re-encode, as one
    Arrow-batched mapInPandas stage (the standard image-preprocessing shape
    for a training-data pipeline). Undecodable payloads are dropped with
    their media_id (a production run routes them to a quarantine sink)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(payload)
                except (ValueError, NotImplementedError):
                    continue
                small = resize_nearest(img, out_w, out_h)
                rows.append(
                    (
                        int(mid),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.shape[2]),
                        [float(x) for x in img.mean(axis=(0, 1))],
                        encode_sppm(small),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[f.name for f in DECODED_SCHEMA.fields],
                )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(_run, schema=DECODED_SCHEMA)


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
