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


def test_grouped_delta_roundtrip_property():
    from share_spark.index.codec import (
        delta_encode_blocks,
        grouped_delta_decode,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        n_groups = int(rng.integers(1, 30))
        lengths = rng.integers(1, 12, size=n_groups)
        flats = []
        for ln in lengths:
            # ascending positions within a group (arbitrary start)
            start = int(rng.integers(0, 50))
            flats.append(start + np.cumsum(rng.integers(0, 9, size=ln)))
        flat = np.concatenate(flats).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        ends = np.cumsum(lengths)
        bufs = delta_encode_blocks(flat, starts, ends)
        # buffers are self-delimiting: concat + one decode call
        got = grouped_delta_decode(b"".join(bufs), lengths)
        np.testing.assert_array_equal(got, flat)


def test_gather_and_filter_groups():
    from share_spark.index.codec import filter_groups, gather_groups

    flat = np.array([0, 1, 2, 10, 20, 21, 30], dtype=np.int64)
    lengths = np.array([3, 1, 2, 1], dtype=np.int64)
    order = np.array([2, 0, 3, 1])
    np.testing.assert_array_equal(
        gather_groups(flat, lengths, order),
        np.array([20, 21, 0, 1, 2, 30, 10]),
    )
    keep = np.array([True, False, True, False])
    np.testing.assert_array_equal(
        filter_groups(flat, lengths, keep), np.array([0, 1, 2, 20, 21])
    )
    # empty order / all-dropped
    assert gather_groups(flat, lengths, np.array([], dtype=int)).size == 0
    assert filter_groups(flat, lengths, np.zeros(4, dtype=bool)).size == 0
