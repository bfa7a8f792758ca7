"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs via mapInPandas. PNG (stdlib zlib + numpy, `decode_png`),
baseline JPEG (pure numpy Huffman+DCT, share_spark/jpeg.py) and the
deterministic SPPM test codec all decode for real; webp/avif remain
STUBBED (codec libraries are not in this container — see `decode_image`),
with all Spark-side plumbing (schemas, batch iteration, partitioning, UDF
signatures) real and tested.

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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    import struct

    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(payload: bytes):
    """Pure stdlib-zlib + numpy PNG decoder -> (h, w, c) uint8.

    Supports the dominant web cases: bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced, all
    five scanline filters (None/Sub/Up/Average/Paeth).  Filters 0/1/2
    unfilter vectorized (Sub is a per-lane uint8 cumsum — mod-256 wrap is
    exactly PNG's arithmetic); Average/Paeth have a true sequential
    dependency along x, so those rows fall back to a byte loop.
    Interlaced / 16-bit inputs raise NotImplementedError (honest bound,
    not a silent misdecode)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG")
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"invalid PNG color type {color}")
            color_type = color
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            # transparency for palette/gray images: keep the honest-bound
            # contract — refuse rather than silently decode transparent
            # pixels as opaque palette colors
            raise NotImplementedError("PNG tRNS transparency")
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    rowbytes = width * channels
    if raw.size != height * (rowbytes + 1):
        raise ValueError("PNG scanline data size mismatch")
    raw = raw.reshape(height, rowbytes + 1)
    out = np.empty((height, rowbytes), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        cur = raw[y, 1:]
        if ftype == 0:
            recon = cur.copy()
        elif ftype == 1:  # Sub: lane-wise cumsum, uint8 wrap == mod 256
            recon = np.empty(rowbytes, dtype=np.uint8)
            for lane in range(bpp):
                recon[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.uint8)
        elif ftype == 2:  # Up
            recon = cur + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential along x
            recon = np.empty(rowbytes, dtype=np.uint8)
            for x in range(rowbytes):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                recon[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (tests + round-trips): depth 8, gray/RGB/
    gray-alpha/RGBA by channel count, one filter type for all scanlines."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c

    def _filter_row(cur, prev):
        cur16 = cur.astype(np.int16)
        if filter_type == 0:
            return cur
        if filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), cur16[:-bpp]])
            return ((cur16 - left) & 0xFF).astype(np.uint8)
        if filter_type == 2:
            return ((cur16 - prev.astype(np.int16)) & 0xFF).astype(np.uint8)
        if filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), cur16[:-bpp]])
            return (
                (cur16 - ((left + prev.astype(np.int16)) >> 1)) & 0xFF
            ).astype(np.uint8)
        if filter_type == 4:
            outb = np.empty(len(cur), dtype=np.uint8)
            for x in range(len(cur)):
                av = int(cur[x - bpp]) if x >= bpp else 0
                bv = int(prev[x])
                cv = int(prev[x - bpp]) if x >= bpp else 0
                p = av + bv - cv
                pa, pb, pc = abs(p - av), abs(p - bv), abs(p - cv)
                pred = av if (pa <= pb and pa <= pc) else (bv if pb <= pc else cv)
                outb[x] = (int(cur[x]) - pred) & 0xFF
            return outb
        raise ValueError(f"invalid filter type {filter_type}")

    flat = a.reshape(h, w * c)
    scan = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        scan.append(filter_type)
        scan.extend(_filter_row(flat[y], prev).tobytes())
        prev = flat[y]

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, c) uint8 array.

    SPPM payloads (the deterministic fake) and PNG (stdlib zlib + numpy,
    decode_png) decode for real; remaining codec formats (jpeg/webp/...)
    raise NotImplementedError because PIL/libvips are not in this
    container — the error names the swap point, it is not a silent
    fallback.
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
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from share_spark.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "webp/avif/... require PIL/libvips, not in this container — swap "
        "decode_image's body at deploy time (png decodes via decode_png, "
        "baseline jpeg via share_spark.jpeg.decode_jpeg)"
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
