import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from share_spark.index.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").shape == (0,)


def test_varint_single_byte_values_are_compact():
    vals = np.arange(0, 128, dtype=np.uint64)
    assert len(varint_encode(vals)) == 128


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True
    )
)
def test_delta_roundtrip_property(xs):
    ids = np.array(sorted(xs), dtype=np.uint64)
    assert (delta_decode(delta_encode(ids)) == ids).all()


def test_delta_compresses_dense_runs():
    ids = np.arange(10_000, 20_000, dtype=np.uint64)
    enc = delta_encode(ids)
    # gaps of 1 -> 1 byte each (+2 for the absolute first value)
    assert len(enc) <= 10_000 + 2
