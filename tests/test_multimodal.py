"""Multimodal binary-column plumbing (decode itself is stubbed)."""

import hashlib

import pytest

from share_spark import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 64, 48, None)),
        (2, "video", b"\x00\x00ftyp fake", ("video/mp4", 1920, 1080, 3500)),
        (3, "audio", b"ID3 fake", ("audio/mpeg", None, None, 2000)),
        (4, "image", None, ("image/png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_decode_is_explicitly_stubbed_for_real_codecs():
    # real codec formats still fail loudly (no silent fallback); only the
    # deterministic SPPM fake decodes in this container
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"anything else long enough")


def test_extract_features_shapes_and_determinism(media):
    out = {r["media_id"]: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    r = out[1]
    assert r["n_bytes"] == len(b"\x89PNG fake bytes")
    assert r["sha256"] == hashlib.sha256(b"\x89PNG fake bytes").hexdigest()
    assert len(r["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # null payload handled
    assert out[4]["n_bytes"] == 0
    # deterministic across runs
    again = {r["media_id"]: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert [tuple(out[k]["feature"]) for k in sorted(out)] == [
        tuple(again[k]["feature"]) for k in sorted(again)
    ]


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in plan)
    assert got == [(2, 0), (2, 1000), (2, 2000), (2, 3000)]


def test_sppm_roundtrip_and_resize():
    import numpy as np

    from share_spark.multimodal import decode_image, encode_sppm, resize_nearest

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    back = decode_image(encode_sppm(img))
    np.testing.assert_array_equal(back, img)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    # nearest-neighbor: every output pixel exists in the input
    flat = {tuple(p) for row in img for p in row}
    assert all(tuple(p) in flat for row in small for p in row)

    import pytest

    # PNG and JPEG now decode for real — corrupt bytes are a data error
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"0" * 32)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"0" * 32)
    with pytest.raises(ValueError):
        decode_image(b"SPPM\x00")


def test_decode_and_resize_pipeline(spark):
    import numpy as np

    from share_spark.multimodal import decode_and_resize, decode_image, encode_sppm

    rng = np.random.default_rng(6)
    rows = []
    for i in range(20):
        img = rng.integers(0, 256, size=(6 + i % 5, 4 + i % 3, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_sppm(img)), ("image/sppm", int(img.shape[1]), int(img.shape[0]), None)))
    rows.append((99, "image", bytearray(b"\xff\xd8\xffjpegjunk"), ("image/jpeg", None, None, None)))
    rows.append((100, "video", bytearray(b"unused"), ("video/mp4", None, None, 5000)))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:long>",
    )
    out = {r["media_id"]: r for r in decode_and_resize(media, 4, 4).collect()}
    assert set(out) == set(range(20))  # jpeg junk + video dropped, not fatal
    for i, r in out.items():
        assert r["channels"] == 3
        resized = decode_image(bytes(r["resized"]))
        assert resized.shape == (4, 4, 3)
        assert 0.0 <= min(r["mean_pixel"]) and max(r["mean_pixel"]) <= 255.0


# ---- PNG codec (stdlib zlib + numpy) ---------------------------------------


def _reference_unfilter(height, width, channels, scanlines):
    """Independent scalar PNG unfilter (spec pseudocode, no numpy) used to
    cross-check decode_png's vectorized paths."""
    bpp = channels
    rowbytes = width * channels
    out = []
    prev = [0] * rowbytes
    for y in range(height):
        ftype = scanlines[y * (rowbytes + 1)]
        cur = list(
            scanlines[y * (rowbytes + 1) + 1 : (y + 1) * (rowbytes + 1)]
        )
        recon = [0] * rowbytes
        for x in range(rowbytes):
            a = recon[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[x] = (cur[x] + pred) & 0xFF
        out.append(recon)
        prev = recon
    return out


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(channels, filter_type):
    import numpy as np

    rng = np.random.default_rng(channels * 10 + filter_type)
    img = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    png = multimodal.encode_png(img, filter_type=filter_type)
    got = multimodal.decode_png(png)
    assert got.shape == img.shape
    assert (got == img).all()
    # decode_image dispatches PNG by magic
    assert (multimodal.decode_image(png) == img).all()


def test_png_vectorized_unfilter_matches_scalar_reference():
    """Cross-check the numpy fast paths (Sub cumsum, Up add) against a
    from-the-spec scalar implementation on mixed-filter scanline data."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(99)
    h, w, c = 7, 11, 3
    rowbytes = w * c
    # raw filtered stream with a DIFFERENT filter per row, incl. all five
    scan = bytearray()
    for y in range(h):
        scan.append(y % 5)
        scan.extend(rng.integers(0, 256, size=rowbytes, dtype=np.uint8).tobytes())

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    got = multimodal.decode_png(png)
    want = _reference_unfilter(h, w, c, bytes(scan))
    assert got.reshape(h, rowbytes).tolist() == want


def test_png_palette_and_golden_pixels():
    import struct
    import zlib

    import numpy as np

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    # 2x2 palette image: indices [[0,1],[2,0]] over a 3-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = bytes([0, 0, 1]) + bytes([0, 2, 0])
    png = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = multimodal.decode_png(png)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert (got == want).all()


def test_png_honest_bounds():
    import struct
    import zlib

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    bad_depth = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        multimodal.decode_png(bad_depth)
    interlaced = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        multimodal.decode_png(interlaced)
    # jpeg now decodes for real — fake payloads are a data error
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jfif fake payload")
    # unknown container formats keep the honest stub
    with pytest.raises(NotImplementedError, match="webp"):
        multimodal.decode_image(b"RIFF....WEBPVP8 fake")


def test_decode_and_resize_accepts_real_png(spark):
    import numpy as np

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    rows = [
        (1, "image", bytearray(multimodal.encode_png(img, filter_type=4)),
         ("image/png", 6, 4, None)),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_and_resize(media, out_w=2, out_h=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["channels"]) == (6, 4, 3)
    assert r["mean_pixel"] == pytest.approx(list(img.mean(axis=(0, 1))))
    small = multimodal.decode_image(bytes(r["resized"]))
    assert (small == multimodal.resize_nearest(img, 2, 2)).all()
