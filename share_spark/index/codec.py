"""Posting-list binary codec: docID delta + varint, numpy-vectorized.

The reference delegates posting-list storage to Lucene (FOR/PFOR inside
Elasticsearch; see SURVEY.md §4 "Compression"). Here the layout is explicit:
a posting block stores

- doc ids   : strictly increasing -> delta-encoded (first value absolute),
              then LEB128 varint
- tfs, dls  : raw LEB128 varint (term frequency, document length)

All encode/decode paths are numpy-vectorized (no per-value Python loops over
postings; loops are over *byte positions*, bounded by max varint width = 10),
so they are safe to call inside Arrow/pandas UDFs per BASELINE.json
input_hint ("no per-row Python").
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_MASK = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode an array; returns (byte_buffer uint8, bytes_per_value).

    The per-value byte counts let callers slice the buffer into sub-ranges
    (grouped encoding) without re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value = ceil(bit_length / 7), minimum 1
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += tmp > 0
        tmp = tmp >> _U7
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offs[1:])
    cur = v.copy()
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        idx = offs[mask] + i
        byte = (cur[mask] & _MASK).astype(np.uint8)
        more = (nbytes[mask] > i + 1).astype(np.uint8)
        out[idx] = byte | (more << 7)
        cur[mask] = cur[mask] >> _U7
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    out, _ = varint_encode_raw(values)
    return out.tobytes()


def varint_encode_blocks(
    values: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    """Encode the whole array ONCE, then slice per block — the grouped form
    used by the posting-block encoder (no per-block numpy dispatch)."""
    out, nbytes = varint_encode_raw(values)
    offs = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    buf = out.tobytes()
    return [
        buf[offs[s] : offs[e]] for s, e in zip(block_starts, block_ends)
    ]


def delta_encode_blocks(
    doc_ids: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    """Per-block delta encoding in one pass: gaps everywhere, absolute value
    at each block start (blocks decode independently)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    gaps = np.empty_like(ids)
    if len(ids):
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[block_starts] = ids[block_starts]
    return varint_encode_blocks(gaps, block_starts, block_ends)


def varint_encode_offsets(
    values: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped LEB128 encode returning (uint8 buffer, int64 byte offsets of
    each block boundary, len(block_starts)+1 entries). The Arrow-native twin
    of varint_encode_blocks: callers wrap (buffer, offsets) into a binary
    array without creating one Python bytes object per block. REQUIRES the
    blocks to tile the input (block_ends[i] == block_starts[i+1]) — the
    posting-block encoder's layout."""
    out, nbytes = varint_encode_raw(values)
    offs = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    bounds = np.empty(len(block_starts) + 1, dtype=np.int64)
    bounds[:-1] = offs[block_starts]
    bounds[-1] = offs[block_ends[-1]] if len(block_ends) else 0
    return out, bounds


def delta_encode_offsets(
    doc_ids: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Offset-returning twin of delta_encode_blocks (same wire bytes)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    gaps = np.empty_like(ids)
    if len(ids):
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[block_starts] = ids[block_starts]
    return varint_encode_offsets(gaps, block_starts, block_ends)


def varint_value_ends(data: np.ndarray) -> np.ndarray:
    """Byte index just past each varint value in a raw LEB128 stream —
    lets callers re-slice a concatenated varint buffer at value boundaries
    without decoding (a varint run's bytes are position-independent)."""
    if data.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    return np.nonzero((data & _CONT) == 0)[0] + 1


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes into a uint64 array (vectorized)."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.shape[0] == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((data & _CONT) == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (data & np.uint8(0x7F)).astype(np.uint64)
    vals = np.zeros(ends.shape[0], dtype=np.uint64)
    lengths = ends - starts + 1
    for i in range(int(lengths.max())):
        mask = lengths > i
        vals[mask] |= payload[starts[mask] + i] << np.uint64(7 * i)
    return vals


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """Encode a strictly-increasing doc-id array: first absolute, rest gaps."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if ids.shape[0] == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return varint_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf)
    return np.cumsum(gaps, dtype=np.uint64)


def grouped_delta_decode(buf: bytes, lengths: np.ndarray) -> np.ndarray:
    """Decode a buffer of concatenated per-group delta runs (absolute first
    value per group, gaps after — the layout delta_encode_blocks writes).

    `lengths[i]` = number of values in group i; returns the flat value array
    (sum(lengths) long). Used for positional postings: group i is posting i's
    in-document token positions, lengths = the block's tf column.

    Varints are self-delimiting, so buffers of consecutive blocks may be
    byte-concatenated and decoded in one call as long as `lengths` is the
    matching concatenation of their tf runs.
    """
    vals = varint_decode(buf).astype(np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = int(lengths.sum())
    if n != vals.shape[0]:
        raise ValueError(f"positions buffer has {vals.shape[0]} values, tfs sum to {n}")
    if n == 0:
        return vals
    starts = np.zeros(lengths.shape[0], dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    c = np.cumsum(vals)
    base = c[starts] - vals[starts]
    return c - np.repeat(base, lengths)


def gather_groups(
    flat: np.ndarray, lengths: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Permute variable-length groups of a flat array: group i occupies
    flat[starts[i]:starts[i]+lengths[i]]; returns groups concatenated in
    `order`. Vectorized (one fancy-gather), used to co-sort positional runs
    with their postings."""
    lengths = np.asarray(lengths, dtype=np.int64)
    starts = np.zeros(lengths.shape[0], dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    ol = lengths[order]
    total = int(ol.sum())
    if total == 0:
        return flat[:0]
    ostarts = np.zeros(ol.shape[0], dtype=np.int64)
    np.cumsum(ol[:-1], out=ostarts[1:])
    idx = np.repeat(starts[order] - ostarts, ol) + np.arange(total, dtype=np.int64)
    return flat[idx]


def filter_groups(
    flat: np.ndarray, lengths: np.ndarray, keep: np.ndarray
) -> np.ndarray:
    """Drop whole groups from a flat grouped array (tombstone filtering of
    positional runs): returns flat values of groups where keep[i]."""
    return flat[np.repeat(keep, lengths)]


# --------------------------------------------------------------------------
# PFor (patched frame-of-reference) block codec — the Lucene-family
# alternative to LEB128. Per block: one bit width `w` covering most values,
# values packed little-endian at that width, outliers "patched" via an
# exception list of (index, high-bits) records. varint spends >= 1 byte per
# value; tfs (~1-3 bits) and doc-gap / position-gap streams (~4-12 bits)
# are exactly the distributions bit packing wins on.
#
# Block wire format (self-contained, decodes without global state):
#   [w: 1 byte][n_ex: 2 bytes LE]([first: 8 bytes LE] delta blocks only)
#   [packed low bits: ceil(n*w/8) bytes][exceptions: n_ex * 6 bytes
#    (value_index: 2 LE, high_bits: 4 LE)]
# The encoder picks w per block by exact cost argmin over all widths,
# constrained so exception high bits fit 32 bits (w >= maxbits-32) and
# w <= 57 (decode gathers an 8-byte window per value: w + 7 shift <= 64).
#
# Everything below is numpy-vectorized; Python loops run over BIT INDICES
# (<= 57) or BYTE LANES (<= 8), never over values or blocks — the same
# discipline as the varint paths above.
# --------------------------------------------------------------------------

_PFOR_MAXW = 57
_PFOR_HDR = 3
_PFOR_EX_BYTES = 6


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length of a uint64 array (0 for value 0)."""
    bl = np.zeros(v.shape[0], dtype=np.int64)
    tmp = v.copy()
    while tmp.any():
        nz = tmp > 0
        bl[nz] += 1
        tmp >>= np.uint64(1)
    return bl


def _pfor_encode_core(
    values: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    firsts: np.ndarray | None,
) -> list[bytes]:
    """Shared encoder: pack values[starts[i]:ends[i]] per block; `firsts`
    (delta mode) adds an 8-byte absolute-first header per block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.asarray(block_starts, dtype=np.int64)
    ends = np.asarray(block_ends, dtype=np.int64)
    nb = starts.shape[0]
    if nb == 0:
        return []
    lens = ends - starts
    total = int(lens.sum())
    vstarts = np.zeros(nb, dtype=np.int64)
    np.cumsum(lens[:-1], out=vstarts[1:])
    # flat per-block value stream (gidx == arange when blocks tile the input)
    gidx = np.repeat(starts - vstarts, lens) + np.arange(total, dtype=np.int64)
    vals = v[gidx]
    bid = np.repeat(np.arange(nb, dtype=np.int64), lens)
    k = np.arange(total, dtype=np.int64) - np.repeat(vstarts, lens)

    bl = _bit_lengths(vals)
    # per-block bit-length histogram -> exception counts for every width
    hist = np.bincount(bid * 65 + bl, minlength=nb * 65).reshape(nb, 65)
    # exc_at_w[:, w] = count(values with bits > w), w in 0..64
    suffix = hist[:, ::-1].cumsum(axis=1)[:, ::-1]
    exc_at_w = np.zeros((nb, 65), dtype=np.int64)
    exc_at_w[:, :64] = suffix[:, 1:]
    maxbits = 64 - np.argmax(hist[:, ::-1] > 0, axis=1)  # blocks are non-empty

    W = np.arange(_PFOR_MAXW + 1, dtype=np.int64)
    cost = (lens[:, None] * W[None, :] + 7) // 8 + _PFOR_EX_BYTES * exc_at_w[
        :, : _PFOR_MAXW + 1
    ]
    invalid = W[None, :] < np.maximum(maxbits - 32, 0)[:, None]
    # exception value-index is 2 bytes: blocks longer than 65535 values must
    # encode exception-free (w >= maxbits)
    too_long = lens > 0xFFFF
    if too_long.any():
        if (maxbits[too_long] > _PFOR_MAXW).any():
            raise ValueError(
                "pfor block > 65535 values needs width > 57 bits"
            )
        invalid |= too_long[:, None] & (W[None, :] < maxbits[:, None])
    invalid |= exc_at_w[:, : _PFOR_MAXW + 1] > 0xFFFF
    cost[invalid] = np.iinfo(np.int64).max
    w = np.argmin(cost, axis=1).astype(np.int64)

    wv = w[bid]
    pb = (lens * w + 7) // 8
    nex = exc_at_w[np.arange(nb), w]
    hdr = _PFOR_HDR + (8 if firsts is not None else 0)
    blen = hdr + pb + _PFOR_EX_BYTES * nex
    boffs = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(blen, out=boffs[1:])
    out = np.zeros(int(boffs[-1]), dtype=np.uint8)

    # headers
    out[boffs[:-1]] = w.astype(np.uint8)
    out[boffs[:-1] + 1] = (nex & 0xFF).astype(np.uint8)
    out[boffs[:-1] + 2] = (nex >> 8).astype(np.uint8)
    if firsts is not None:
        f = np.ascontiguousarray(firsts, dtype=np.uint64)
        for t in range(8):
            out[boffs[:-1] + 3 + t] = (
                (f >> np.uint64(8 * t)) & np.uint64(0xFF)
            ).astype(np.uint8)

    p0 = boffs[:-1] + hdr
    low = vals & ((np.uint64(1) << wv.astype(np.uint64)) - np.uint64(1))

    # packed payload, one vectorized pass per distinct width
    for ww in np.unique(w):
        if ww == 0:
            continue
        bsel = w == ww
        sel = wv == ww
        pb_sel = pb[bsel]
        class_bits = np.zeros(bsel.sum(), dtype=np.int64)
        np.cumsum(pb_sel[:-1] * 8, out=class_bits[1:])
        clspos = np.cumsum(bsel) - 1  # block -> position within class
        base = class_bits[clspos[bid[sel]]] + k[sel] * ww
        bitbuf = np.zeros(int(pb_sel.sum()) * 8, dtype=np.uint8)
        lsel = low[sel]
        for j in range(int(ww)):
            bitbuf[base + j] = (
                (lsel >> np.uint64(j)) & np.uint64(1)
            ).astype(np.uint8)
        classbytes = np.packbits(bitbuf, bitorder="little")
        # scatter class payload into per-block slots
        cb_starts = np.zeros(bsel.sum(), dtype=np.int64)
        np.cumsum(pb_sel[:-1], out=cb_starts[1:])
        oidx = np.repeat(p0[bsel] - cb_starts, pb_sel) + np.arange(
            int(pb_sel.sum()), dtype=np.int64
        )
        out[oidx] = classbytes

    # exceptions
    exmask = bl > wv
    tex = int(exmask.sum())
    if tex:
        exb = bid[exmask]
        exidx = k[exmask]
        exhigh = (vals[exmask] >> wv[exmask].astype(np.uint64)).astype(np.uint64)
        exoff = p0 + pb
        nex_starts = np.zeros(nb, dtype=np.int64)
        np.cumsum(nex[:-1], out=nex_starts[1:])
        within = np.arange(tex, dtype=np.int64) - nex_starts[exb]
        o = exoff[exb] + _PFOR_EX_BYTES * within
        out[o] = (exidx & 0xFF).astype(np.uint8)
        out[o + 1] = (exidx >> 8).astype(np.uint8)
        for t in range(4):
            out[o + 2 + t] = (
                (exhigh >> np.uint64(8 * t)) & np.uint64(0xFF)
            ).astype(np.uint8)

    buf = out.tobytes()
    return [buf[boffs[i] : boffs[i + 1]] for i in range(nb)]


def pfor_encode_blocks(
    values: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    """PFor-encode a plain value stream per block (tfs / dls / pos runs)."""
    return _pfor_encode_core(values, block_starts, block_ends, None)


def pfor_delta_encode_blocks(
    doc_ids: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    """PFor-encode strictly-increasing ids: absolute first in the header,
    gap stream (gap[0] = 0) bit-packed."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    gaps = np.empty_like(ids)
    if len(ids):
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    starts = np.asarray(block_starts, dtype=np.int64)
    gaps[starts] = 0
    return _pfor_encode_core(gaps, starts, block_ends, ids[starts])


def _pfor_decode_core(
    buf: bytes, byte_lens: np.ndarray, counts: np.ndarray, delta: bool
) -> np.ndarray:
    """Decode concatenated pfor blocks. `byte_lens[i]` / `counts[i]` =
    encoded bytes / value count of block i. Returns the flat uint64 values
    (absolute ids when delta=True)."""
    nb = len(byte_lens)
    counts = np.asarray(counts, dtype=np.int64)
    if nb == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(buf + b"\x00" * 8, dtype=np.uint8)
    byte_lens = np.asarray(byte_lens, dtype=np.int64)
    boffs = np.zeros(nb, dtype=np.int64)
    np.cumsum(byte_lens[:-1], out=boffs[1:])
    w = arr[boffs].astype(np.int64)
    nex = arr[boffs + 1].astype(np.int64) | (arr[boffs + 2].astype(np.int64) << 8)
    hdr = _PFOR_HDR + (8 if delta else 0)
    pb = (counts * w + 7) // 8
    expect = hdr + pb + _PFOR_EX_BYTES * nex
    if not np.array_equal(expect, byte_lens):
        raise ValueError("corrupt pfor block stream (length mismatch)")
    p0 = boffs + hdr

    total = int(counts.sum())
    out = np.zeros(total, dtype=np.uint64)
    vstarts = np.zeros(nb, dtype=np.int64)
    np.cumsum(counts[:-1], out=vstarts[1:])
    k = np.arange(total, dtype=np.int64) - np.repeat(vstarts, counts)
    wv = np.repeat(w, counts)
    p0v = np.repeat(p0, counts)

    for ww in np.unique(w):
        if ww == 0:
            continue
        sel = wv == ww
        bitpos = p0v[sel] * 8 + k[sel] * ww
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(np.uint64)
        word = np.zeros(byte.shape[0], dtype=np.uint64)
        for t in range(8):
            word |= arr[byte + t].astype(np.uint64) << np.uint64(8 * t)
        out[sel] = (word >> sh) & (
            (np.uint64(1) << np.uint64(ww)) - np.uint64(1)
        )

    tex = int(nex.sum())
    if tex:
        exoff = p0 + pb
        exb = np.repeat(np.arange(nb, dtype=np.int64), nex)
        nex_starts = np.zeros(nb, dtype=np.int64)
        np.cumsum(nex[:-1], out=nex_starts[1:])
        within = np.arange(tex, dtype=np.int64) - nex_starts[exb]
        o = exoff[exb] + _PFOR_EX_BYTES * within
        idx = arr[o].astype(np.int64) | (arr[o + 1].astype(np.int64) << 8)
        high = np.zeros(tex, dtype=np.uint64)
        for t in range(4):
            high |= arr[o + 2 + t].astype(np.uint64) << np.uint64(8 * t)
        out[vstarts[exb] + idx] |= high << w[exb].astype(np.uint64)

    if delta:
        firsts = np.zeros(nb, dtype=np.uint64)
        for t in range(8):
            firsts |= arr[boffs + 3 + t].astype(np.uint64) << np.uint64(8 * t)
        c = np.cumsum(out)
        base = c[vstarts] - out[vstarts]
        return c - np.repeat(base, counts) + np.repeat(firsts, counts)
    return out


# --------------------------------------------------------------------------
# Hybrid block codec ("pfor" in IndexConfig.postings_codec): per block, the
# encoder emits whichever of {PFor, LEB128 varint} is smaller. Tiny tail
# blocks (a term touching a chunk with a handful of docs — the majority of
# BLOCKS, a minority of BYTES) stay varint (PFor's 3-11 byte header loses
# there); dense head-term blocks and all-ones tf runs go PFor (a 128-posting
# all-tf=1 block packs to 3 + 128/8 = 19 bytes at width 1, vs 128 varint
# bytes). Measured at 20k-doc default geometry: 1.24x smaller raw postings
# than pure varint (tfs 2.9x).
#
# Wire format: first byte 0xFF => varint block, payload is the exact layout
# delta_encode_blocks/varint_encode_blocks write; first byte <= 57 => PFor
# block as documented above. Decode splits blocks by tag and runs each
# subset's vectorized decoder, scattering into one output array.
# --------------------------------------------------------------------------

_VARINT_TAG = 0xFF


def _hybrid_pick(varint_blocks: list[bytes], pfor_blocks: list[bytes]) -> list[bytes]:
    tag = b"\xff"
    return [
        p if len(p) < len(v) + 1 else tag + v
        for v, p in zip(varint_blocks, pfor_blocks)
    ]


def hybrid_encode_plain_blocks(
    values: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    return _hybrid_pick(
        varint_encode_blocks(values, block_starts, block_ends),
        pfor_encode_blocks(values, block_starts, block_ends),
    )


def hybrid_encode_delta_blocks(
    doc_ids: np.ndarray, block_starts: np.ndarray, block_ends: np.ndarray
) -> list[bytes]:
    return _hybrid_pick(
        delta_encode_blocks(doc_ids, block_starts, block_ends),
        pfor_delta_encode_blocks(doc_ids, block_starts, block_ends),
    )


def _subset_bytes(
    arr: np.ndarray, boffs: np.ndarray, lens: np.ndarray, sel: np.ndarray,
    skip: int,
) -> bytes:
    """Gather the concatenated payloads of selected blocks (dropping `skip`
    leading tag bytes per block) — one fancy-index, no per-block Python."""
    l = lens[sel] - skip
    total = int(l.sum())
    if total == 0:
        return b""
    ss = np.zeros(sel.sum(), dtype=np.int64)
    np.cumsum(l[:-1], out=ss[1:])
    idx = np.repeat(boffs[sel] + skip - ss, l) + np.arange(total, dtype=np.int64)
    return arr[idx].tobytes()


def _hybrid_decode(
    bufs, counts: np.ndarray, delta: bool
) -> np.ndarray:
    """Decode hybrid blocks: `bufs` is any iterable of per-block bytes
    (pandas Series of the parquet column), `counts` the per-block posting
    counts. Returns flat values (absolute ids when delta=True), int64."""
    blist = list(bufs)
    counts = np.asarray(counts, dtype=np.int64)
    if not blist:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in blist), dtype=np.int64, count=len(blist))
    arr = np.frombuffer(b"".join(blist), dtype=np.uint8)
    nb = len(blist)
    boffs = np.zeros(nb, dtype=np.int64)
    np.cumsum(lens[:-1], out=boffs[1:])
    vsel = arr[boffs] == _VARINT_TAG
    total = int(counts.sum())
    if vsel.all():
        sub = _subset_bytes(arr, boffs, lens, vsel, 1)
        if delta:
            return grouped_delta_decode(sub, counts).astype(np.int64)
        return varint_decode(sub).astype(np.int64)
    psel = ~vsel
    out = np.empty(total, dtype=np.int64)
    vmask = np.repeat(vsel, counts)
    if vsel.any():
        sub = _subset_bytes(arr, boffs, lens, vsel, 1)
        dec = (
            grouped_delta_decode(sub, counts[vsel])
            if delta
            else varint_decode(sub)
        )
        out[vmask] = dec.astype(np.int64)
    sub = _subset_bytes(arr, boffs, lens, psel, 0)
    dec = _pfor_decode_core(sub, lens[psel], counts[psel], delta)
    out[~vmask] = dec.astype(np.int64)
    return out


def runs_to_positions(vals: np.ndarray, run_lengths: np.ndarray) -> np.ndarray:
    """Turn a stored positional value stream (absolute first per run, gaps
    after) into absolute positions — the tail of grouped_delta_decode."""
    vals = np.asarray(vals, dtype=np.int64)
    lengths = np.asarray(run_lengths, dtype=np.int64)
    n = int(lengths.sum())
    if n != vals.shape[0]:
        raise ValueError(f"positions stream has {vals.shape[0]} values, runs sum to {n}")
    if n == 0:
        return vals
    starts = np.zeros(lengths.shape[0], dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    c = np.cumsum(vals)
    base = c[starts] - vals[starts]
    return c - np.repeat(base, lengths)


class _VarintCodec:
    """Pure LEB128 layout (delta-varint-blocks-v2-pos) — the default."""

    name = "varint"
    layout = "delta-varint-blocks-v2-pos"
    encode_plain_blocks = staticmethod(varint_encode_blocks)
    encode_delta_blocks = staticmethod(delta_encode_blocks)

    @staticmethod
    def decode_plain(bufs, counts) -> np.ndarray:
        return varint_decode(b"".join(bufs)).astype(np.int64)

    @staticmethod
    def decode_delta(bufs, counts) -> np.ndarray:
        return grouped_delta_decode(b"".join(bufs), counts).astype(np.int64)

    @staticmethod
    def decode_runs(bufs, counts, run_lengths) -> np.ndarray:
        return grouped_delta_decode(b"".join(bufs), run_lengths).astype(np.int64)


class _PForCodec:
    """Hybrid PFor/varint layout (delta-pfor-hybrid-blocks-v3-pos)."""

    name = "pfor"
    layout = "delta-pfor-hybrid-blocks-v3-pos"
    encode_plain_blocks = staticmethod(hybrid_encode_plain_blocks)
    encode_delta_blocks = staticmethod(hybrid_encode_delta_blocks)

    @staticmethod
    def decode_plain(bufs, counts) -> np.ndarray:
        return _hybrid_decode(bufs, counts, False)

    @staticmethod
    def decode_delta(bufs, counts) -> np.ndarray:
        return _hybrid_decode(bufs, counts, True)

    @staticmethod
    def decode_runs(bufs, counts, run_lengths) -> np.ndarray:
        # per-block value count of the positional stream = sum of its tfs
        counts = np.asarray(counts, dtype=np.int64)
        rl = np.asarray(run_lengths, dtype=np.int64)
        starts = np.zeros(counts.shape[0], dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        vcounts = (
            np.add.reduceat(rl, starts)
            if rl.shape[0]
            else np.zeros(counts.shape[0], dtype=np.int64)
        )
        if counts.shape[0]:
            vcounts[counts == 0] = 0  # reduceat repeats on empty slices
        vals = _hybrid_decode(bufs, vcounts, False)
        return runs_to_positions(vals, rl)


POSTING_CODECS = {"varint": _VarintCodec, "pfor": _PForCodec}


def get_codec(name: str):
    try:
        return POSTING_CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown postings codec {name!r} (have {sorted(POSTING_CODECS)})"
        ) from None
