"""Baseline JPEG codec in pure numpy + stdlib (no PIL/libvips).

Implements the baseline sequential DCT process of ITU-T T.81 (the public
JPEG spec): Huffman entropy coding, 8-bit samples, grayscale or YCbCr with
arbitrary (H,V) sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, and the standard Annex K quantization/Huffman tables on the
encode side. Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise NotImplementedError — an honest bound, never a
silent misdecode.

Execution shape: `decode_jpeg` runs inside the multimodal plane's
Arrow-batched mapInPandas kernels (multimodal.py) — one payload per call,
rows parallel across partitions. The entropy decode is a per-bit Python
loop (Huffman is inherently sequential within one scan), but the
dequantize + IDCT of ALL blocks happens as two numpy einsums, so the
arithmetic-heavy half is vectorized.

Reference-parity note: the reference repo (CenterForOpenScience/SHARE) has
no image pipeline; this module serves the LLM-training-data brief's
multimodal column (SURVEY.md LLM-pipeline table).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# T.81 Figure A.6 zigzag order: ZIGZAG[i] = natural index of the i-th
# zigzag-ordered coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Table K.1 / K.2 example quantization tables (natural order).
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99]
    + [18, 21, 26, 66, 99, 99, 99, 99]
    + [24, 26, 56, 99, 99, 99, 99, 99]
    + [47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# T.81 Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
# so that spatial = A.T @ coef @ A and coef = A @ spatial @ A.T.
_A = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Vectorized 2-D inverse DCT of (n, 8, 8) coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _A, coefs, _A, optimize=True)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Vectorized 2-D forward DCT of (n, 8, 8) spatial blocks."""
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)


def _build_huffman_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """{(length, code): symbol} for bitwise decoding."""
    table = {}
    for sym, (code, length) in _build_huffman_codes(bits, vals).items():
        table[(length, code)] = sym
    return table


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing and restart-
    marker handling (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None  # pending marker byte (0xD0-0xD7, 0xD9, ...)

    def _fill(self) -> bool:
        data, pos = self.data, self.pos
        if self.marker is not None or pos >= len(data):
            return False
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= len(data):
                return False
            nxt = data[pos + 1]
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos = pos + 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos = pos + 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            # past the marker: T.81 pads with 1-bits
            return 1
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align, consume the pending RSTn marker."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            # seek forward to the marker (spec requires it adjacent)
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2
        self.marker = None

    def decode_huffman(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, c) uint8 array (c = 1 or 3;
    3-component YCbCr converts to RGB per JFIF / BT.601 full-range)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    zz = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    zz = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended seq.
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline/extended "
                "sequential Huffman (SOF0/SOF1) is supported"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, frame, scan, qtables, htables, ri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = {
        c["id"]: np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.float64
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_index and mcu_index % ri == 0:
                reader.restart()
                preds = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                dc_tbl = htables.get((0, td))
                ac_tbl = htables.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references missing DHT")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = coefs[comp["id"]][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        t = reader.decode_huffman(dc_tbl)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        preds[comp["id"]] += diff
                        blk[0] = preds[comp["id"]]
                        k = 1
                        while k <= 63:
                            rs = reader.decode_huffman(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_index += 1
    # dequantize + IDCT, vectorized per component
    planes = {}
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("JPEG frame references missing DQT")
        flat = coefs[c["id"]].reshape(-1, 64) * q.astype(np.float64)
        spatial = idct_blocks(flat.reshape(-1, 8, 8)) + 128.0
        by, bx = coefs[c["id"]].shape[:2]
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample subsampled components to full resolution
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        out = planes[comps[0]["id"]][:, :, None]
    elif len(comps) == 3:
        y, cb, cr = (planes[c["id"]] for c in comps)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    else:
        raise NotImplementedError(
            f"JPEG with {len(comps)} components (only 1 or 3)"
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, zz, dc_codes, ac_codes, pred):
    """Encode one zigzag-ordered quantized block; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a 2-D plane to 8-multiples by edge replication and return
    quant-ready (by, bx, 8, 8) float blocks (level-shifted)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.astype(np.float64)
        .reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
    ) - 128.0


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) or (h, w, 1|3) uint8 array as baseline JPEG with
    the Annex K standard tables. `subsample=True` uses 4:2:0 chroma
    (box-filter downsample); `restart_interval` emits DRI + RSTn markers
    every that many MCUs."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    qlum = _scale_quant(QUANT_LUM, quality)
    qchrom = _scale_quant(QUANT_CHROM, quality)

    if c == 1:
        planes = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
        yy = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def down(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )

            planes = [yy, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [yy, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # per-component quantized zigzag blocks, (by, bx, 64) int
    qz = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        qtab = qlum if ci == 0 else qchrom
        blocks = _plane_blocks(plane)
        by, bx = blocks.shape[:2]
        coef = fdct_blocks(blocks.reshape(-1, 8, 8))
        q = np.round(coef.reshape(-1, 64) / qtab.astype(np.float64)).astype(
            np.int64
        )
        qz.append(q[:, ZIGZAG].reshape(by, bx, 64))
    # pad block grids to MCU multiples by replicating edge blocks
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for ci, (sh, sv) in enumerate(samp):
        by, bx, _ = qz[ci].shape
        nby, nbx = mcuy * sv, mcux * sh
        if (by, bx) != (nby, nbx):
            grid = qz[ci]
            grid = np.concatenate(
                [grid, np.repeat(grid[-1:], nby - by, axis=0)], axis=0
            )
            grid = np.concatenate(
                [grid, np.repeat(grid[:, -1:], nbx - bx, axis=1)], axis=1
            )
            qz[ci] = grid

    dc_lum = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chrom = _build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chrom = _build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_index // restart_interval - 1) % 8)]
                )
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                dcc = dc_lum if ci == 0 else dc_chrom
                acc = ac_lum if ci == 0 else ac_chrom
                for byi in range(sv):
                    for bxi in range(sh):
                        preds[ci] = _encode_block(
                            bw,
                            qz[ci][my * sv + byi, mx * sh + bxi],
                            dcc,
                            acc,
                            preds[ci],
                        )
            mcu_index += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qlum[ZIGZAG].tolist()))
    if c == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qchrom[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if c == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([c])
    for ci in range(c):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
