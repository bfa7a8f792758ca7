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


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"anything")


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
