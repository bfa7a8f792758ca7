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


# ----------------------------------------------------------------------
# PFor / hybrid block codec
# ----------------------------------------------------------------------


def _block_edges(n, bs):
    starts = np.arange(0, n, bs, dtype=np.int64)
    return starts, np.minimum(starts + bs, n)


def _pfor_roundtrip_plain(vals, bs=128):
    from share_spark.index.codec import _pfor_decode_core, pfor_encode_blocks

    starts, ends = _block_edges(len(vals), bs)
    blocks = pfor_encode_blocks(vals, starts, ends)
    lens = np.fromiter((len(b) for b in blocks), dtype=np.int64)
    got = _pfor_decode_core(b"".join(blocks), lens, ends - starts, False)
    np.testing.assert_array_equal(got.astype(np.uint64), vals.astype(np.uint64))
    return blocks


def test_pfor_plain_roundtrip_distributions():
    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 8, 5000),            # narrow (tf-like)
        rng.zipf(1.3, 5000),                 # heavy tail -> exceptions
        rng.integers(0, 2**62, 3000),        # wide values (w floor = max-32)
        np.ones(4000, dtype=np.int64),       # all-equal -> 1-bit packing
        np.zeros(4000, dtype=np.int64),      # width-0 blocks
    ]
    for v in cases:
        _pfor_roundtrip_plain(np.asarray(v, dtype=np.uint64))


def test_pfor_block_longer_than_exception_index_range():
    # 200k-value block: exception value-index (2 bytes) can't address it,
    # so the encoder must pick an exception-free width and still round-trip
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, 200_000).astype(np.uint64)
    v[123_456] = 2**40  # forces maxbits high in an otherwise narrow block
    _pfor_roundtrip_plain(v, bs=200_000)


def test_pfor_delta_roundtrip_and_size_win():
    from share_spark.index.codec import (
        _pfor_decode_core,
        delta_encode_blocks,
        pfor_delta_encode_blocks,
    )

    rng = np.random.default_rng(5)
    # dense doc ids (gap ~3): the distribution bit packing wins on
    ids = np.cumsum(rng.integers(1, 6, 20_000)).astype(np.uint64)
    starts, ends = _block_edges(len(ids), 128)
    pb = pfor_delta_encode_blocks(ids, starts, ends)
    lens = np.fromiter((len(b) for b in pb), dtype=np.int64)
    got = _pfor_decode_core(b"".join(pb), lens, ends - starts, True)
    np.testing.assert_array_equal(got.astype(np.uint64), ids)
    vb = delta_encode_blocks(ids, starts, ends)
    assert sum(map(len, pb)) < sum(map(len, vb))


@settings(deadline=None, max_examples=30)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=500
    ),
    st.integers(min_value=1, max_value=64),
)
def test_hybrid_plain_roundtrip_property(xs, bs):
    from share_spark.index.codec import _hybrid_decode, hybrid_encode_plain_blocks

    v = np.array(xs, dtype=np.uint64)
    starts, ends = _block_edges(len(v), bs)
    blocks = hybrid_encode_plain_blocks(v, starts, ends)
    got = _hybrid_decode(blocks, ends - starts, False)
    np.testing.assert_array_equal(got.astype(np.uint64), v)


@settings(deadline=None, max_examples=30)
@given(
    st.lists(
        st.integers(min_value=1, max_value=2**40), min_size=1, max_size=400
    ),
    st.integers(min_value=1, max_value=64),
)
def test_hybrid_delta_roundtrip_property(gaps, bs):
    from share_spark.index.codec import _hybrid_decode, hybrid_encode_delta_blocks

    ids = np.cumsum(np.array(gaps, dtype=np.uint64))
    starts, ends = _block_edges(len(ids), bs)
    blocks = hybrid_encode_delta_blocks(ids, starts, ends)
    got = _hybrid_decode(blocks, ends - starts, True)
    np.testing.assert_array_equal(got.astype(np.uint64), ids)


def test_hybrid_mixes_block_kinds():
    """A stream with tiny sparse blocks AND dense all-ones blocks should pick
    varint for some blocks and PFor for others — and still decode as one."""
    from share_spark.index.codec import (
        _VARINT_TAG,
        _hybrid_decode,
        hybrid_encode_plain_blocks,
    )

    dense = np.ones(512, dtype=np.uint64)
    # 3-value tail block of 1-byte varints: 3+1 tag bytes beats PFor's
    # 3-byte header + packed payload
    sparse = np.array([3, 7, 100], dtype=np.uint64)
    v = np.concatenate([dense, sparse])
    starts = np.array([0, 128, 256, 384, 512])
    ends = np.array([128, 256, 384, 512, 515])
    blocks = hybrid_encode_plain_blocks(v, starts, ends)
    kinds = {b[0] == _VARINT_TAG for b in blocks}
    assert kinds == {True, False}  # both kinds present
    got = _hybrid_decode(blocks, ends - starts, False)
    np.testing.assert_array_equal(got.astype(np.uint64), v)


def test_codec_runs_decode_equivalence():
    """decode_runs parity between the varint and pfor codec classes on the
    positional-run layout (absolute first per run, gaps after)."""
    from share_spark.index.codec import _PForCodec, _VarintCodec

    rng = np.random.default_rng(13)
    n_postings = 2000
    tfs = rng.integers(1, 7, n_postings).astype(np.int64)
    runs = []
    for tf in tfs:
        runs.append(np.concatenate((
            rng.integers(0, 100, 1), rng.integers(1, 30, tf - 1)
        )))
    stream = np.concatenate(runs).astype(np.int64)
    ctf = np.concatenate(([0], np.cumsum(tfs)))
    bs = 128
    bstarts, bends = _block_edges(n_postings, bs)
    ns = bends - bstarts
    from share_spark.index.codec import (
        hybrid_encode_plain_blocks,
        varint_encode_blocks,
    )

    vb = varint_encode_blocks(stream, ctf[bstarts], ctf[bends])
    hb = hybrid_encode_plain_blocks(stream, ctf[bstarts], ctf[bends])
    a = _VarintCodec.decode_runs(vb, ns, tfs)
    b = _PForCodec.decode_runs(hb, ns, tfs)
    np.testing.assert_array_equal(a, b)
    # absolute positions: cumsum within each run
    exp = np.concatenate([np.cumsum(r) for r in runs])
    np.testing.assert_array_equal(np.asarray(b), exp)


def test_pfor_corrupt_stream_raises():
    import pytest

    from share_spark.index.codec import _pfor_decode_core, pfor_encode_blocks

    v = np.arange(100, dtype=np.uint64)
    blocks = pfor_encode_blocks(v, np.array([0]), np.array([100]))
    buf = b"".join(blocks)
    with pytest.raises(ValueError, match="corrupt"):
        _pfor_decode_core(buf[:-2], np.array([len(buf) - 2]), np.array([100]), False)


def test_get_codec_registry():
    import pytest

    from share_spark.index.codec import get_codec

    assert get_codec("varint").layout == "delta-varint-blocks-v2-pos"
    assert get_codec("pfor").layout == "delta-pfor-hybrid-blocks-v3-pos"
    with pytest.raises(ValueError, match="unknown postings codec"):
        get_codec("snappy")
