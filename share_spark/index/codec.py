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
