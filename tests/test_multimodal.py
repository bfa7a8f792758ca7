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

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"0" * 32)
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
