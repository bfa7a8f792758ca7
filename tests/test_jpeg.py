"""Baseline JPEG codec (share_spark/jpeg.py): spec-derived golden bytes,
encode/decode round-trips across color/subsampling/restart geometries, and
the multimodal-plane dispatch."""

import struct

import numpy as np
import pytest

from share_spark import multimodal
from share_spark.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    decode_jpeg,
    encode_jpeg,
    fdct_blocks,
    idct_blocks,
)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 60 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)).clip(0, 255)
    g = (100 + 80 * np.cos((xx + yy) / 11.0)).clip(0, 255)
    b = (140 + 50 * np.sin(yy / 5.0)).clip(0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_dct_is_orthonormal():
    rng = np.random.default_rng(7)
    x = rng.uniform(-128, 127, size=(17, 8, 8))
    assert np.allclose(idct_blocks(fdct_blocks(x)), x, atol=1e-9)


def test_handassembled_golden_decodes_flat_gray():
    """An 8x8 flat-gray baseline JPEG assembled BY HAND from ITU-T T.81
    (not produced by encode_jpeg): with all coefficients zero the scan is
    DC category-0 ('00' under the canonical Annex K DC table) followed by
    EOB ('1010' under the AC table), padded with 1-bits -> 0x2B. This
    anchors the decoder to the spec independently of our encoder."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    golden = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00] + DC_LUM_BITS + DC_LUM_VALS))
        + seg(0xC4, bytes([0x10] + AC_LUM_BITS + AC_LUM_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x2B])
        + b"\xff\xd9"
    )
    out = decode_jpeg(golden)
    assert out.shape == (8, 8, 1)
    assert (out == 128).all()


def test_flat_gray_roundtrip_is_exact():
    flat = np.full((16, 24, 1), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=85))
    assert out.shape == (16, 24, 1)
    assert (out == 128).all()


def test_gray_gradient_roundtrip_odd_dims():
    g = np.linspace(0, 255, 37 * 53).reshape(37, 53).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (37, 53, 1)
    err = np.abs(out[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_rgb_444_roundtrip():
    img = _smooth_rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 32


def test_rgb_420_subsampled_roundtrip_odd_dims():
    img = _smooth_rgb(33, 47)  # forces chroma-plane and MCU padding paths
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is smooth, so 2x2 box-downsample + nearest-upsample stays close
    assert err.mean() < 4.0 and err.max() < 48


def test_restart_markers_do_not_change_pixels():
    g = np.linspace(0, 255, 32 * 40).reshape(32, 40).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(g, quality=88))
    with_rst = decode_jpeg(encode_jpeg(g, quality=88, restart_interval=3))
    # same quantized coefficients either way -> identical pixels
    assert (plain == with_rst).all()
    img = _smooth_rgb(24, 40)
    plain = decode_jpeg(encode_jpeg(img, quality=88, subsample=True))
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=88, subsample=True, restart_interval=2)
    )
    assert (plain == with_rst).all()


def test_honest_bounds():
    g = np.full((8, 8), 90, dtype=np.uint8)
    good = bytearray(encode_jpeg(g))
    progressive = bytearray(good)
    progressive[progressive.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(progressive))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated mid-headers


def test_decode_image_dispatches_jpeg():
    img = _smooth_rgb(16, 16)
    out = multimodal.decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_decode_and_resize_accepts_real_jpeg(spark):
    img = _smooth_rgb(12, 18)
    rows = [
        (
            7,
            "image",
            bytearray(encode_jpeg(img, quality=95)),
            ("image/jpeg", 18, 12, None),
        ),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_and_resize(media, out_w=3, out_h=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["channels"]) == (18, 12, 3)
    decoded = decode_jpeg(encode_jpeg(img, quality=95))
    assert r["mean_pixel"] == pytest.approx(
        list(decoded.mean(axis=(0, 1))), abs=1e-6
    )
    small = multimodal.decode_image(bytes(r["resized"]))
    assert (small == multimodal.resize_nearest(decoded, 3, 3)).all()
