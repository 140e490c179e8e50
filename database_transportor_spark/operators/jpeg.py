"""Baseline-sequential JPEG codec, pure Python + numpy.

The last fake-decode tier in the multimodal family (round-6 verdict,
next-round #5): AVI demux is real (``multimodal.decode_avi``) but MJPEG
frame payloads only got header dims + NULL ``pixel_sum`` without an
image library.  This module implements the actual ITU-T T.81 baseline
process from the public spec — DCT-II, Annex-K quantization/Huffman
tables, JFIF markers — so the no-dependency environment decodes (and
encodes, for round-trip fixtures) real JPEG scan data:

- :func:`encode_jpeg` — baseline JFIF encoder: level shift → (optional
  RGB→YCbCr) → 8×8 DCT → quality-scaled Annex-K quantization → zigzag →
  differential-DC / run-length-AC Huffman with the Annex-K tables →
  byte-stuffed entropy stream.  4:4:4 sampling (every component full
  resolution) for encode simplicity.
- :func:`decode_jpeg` — baseline sequential decoder: DQT (8/16-bit),
  SOF0 with arbitrary 1–4× sampling factors (4:4:4, 4:2:2, 4:2:0, …),
  DHT canonical code reconstruction, DRI/RSTn restart intervals,
  interleaved-MCU entropy decode, dequantize → IDCT → nearest-neighbor
  chroma upsample → YCbCr→RGB.  Progressive (SOF2) and arithmetic
  coding raise a clear ``ValueError`` naming the unsupported mode.

Determinism contract: both directions are pure functions of the bytes
(float64 DCT/IDCT matrices, then round + clip), so ``pixel_sum`` readouts
are identical on every executor and every environment — which is why
``multimodal.decode_video_frames`` uses THIS decoder for MJPEG even when
pillow is importable (libjpeg IDCT variants differ by ±1 per pixel and
would make the oracle hash environment-dependent).  Constant-color
blocks quantize to a lone DC coefficient and reconstruct EXACTLY, which
is what the SQL-exact ``mjpeg_frames`` oracle builds on.

Scale shape: a codec, not an operator — it runs inside Arrow
``mapInPandas`` batches (see ``multimodal.py``), so the corpus never
shuffles for a decode; cost is CPU-linear in pixels per partition.

Reference parity: the reference engine (src/DBT.php) has no media
surface at all; this belongs to the mandated multimodal extension tier.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# --- Annex K tables (ITU-T T.81, public spec) ---------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# zigzag order: index i of the zigzag sequence -> raster position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# (bits[1..16], values) per Annex K
_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# DCT-II basis matrix (orthonormal): block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _canonical_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol} for the bit reader —
    the same canonical-code walk as :func:`_canonical_codes`, inverted."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    # libjpeg's public quality scaling
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, size-bit amplitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec

    def marker(self, m: int) -> None:
        """Emit a bare marker (RSTn) into the entropy stream, unstuffed."""
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _encode_block(bw, block, qt, enc_dc, enc_ac, pred_val):
    """DCT+quantize+Huffman one 8×8 block; returns the new DC predictor."""
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(
        coef.reshape(64) / qt.astype(np.float64)
    ).astype(np.int64)[_ZIGZAG]
    diff = int(q[0]) - pred_val
    size, amp = _magnitude(diff)
    code, length = enc_dc[size]
    bw.put(code, length)
    if size:
        bw.put(amp, size)
    run = 0
    for i in range(1, 64):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = enc_ac[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        size, amp = _magnitude(v)
        code, length = enc_ac[(run << 4) | size]
        bw.put(code, length)
        bw.put(amp, size)
        run = 0
    if run:
        code, length = enc_ac[0x00]  # EOB
        bw.put(code, length)
    return int(q[0])


def encode_jpeg(arr, quality: int = 90, subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Encode a ``(h, w)`` / ``(h, w, 1)`` grayscale or ``(h, w, 3)`` RGB
    uint8 array as a baseline JFIF JPEG.  ``subsampling``: ``"4:4:4"``
    (every component full resolution) or ``"4:2:0"`` (chroma box-averaged
    2×2, the common camera layout — exercises the decoder's interleaved
    multi-block MCU path).  ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (what camera MJPEG streams do for error
    resilience).  Returns the file bytes."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"encode_jpeg: need (h,w[,1|3]) array, got {a.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    a = a.astype(np.float64)
    h, w, ncomp = a.shape
    if ncomp == 3:  # RGB -> YCbCr (BT.601 full-range JPEG transform)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [a[..., 0]]
    sub = subsampling == "4:2:0" and ncomp == 3
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    if sub:
        # chroma at half resolution: 2×2 box average over an edge-padded
        # even-dimensioned plane
        for ci in (1, 2):
            p = planes[ci]
            p = np.pad(p, ((0, h & 1), (0, w & 1)), mode="edge")
            planes[ci] = (p[0::2, 0::2] + p[1::2, 0::2]
                          + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0

    qtabs = [_scaled_quant(_QUANT_LUMA, quality)]
    if ncomp == 3:
        qtabs.append(_scaled_quant(_QUANT_CHROMA, quality))

    enc_dc = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    enc_ac = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each component plane to its MCU grid by edge replication
    padded = []
    for (ch_, cv), p in zip(hv, planes):
        th, tw = mcuy * cv * 8, mcux * ch_ * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        )
    bw = _BitWriter()
    pred = [0] * ncomp
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.marker(0xD0 + (nmcu // restart_interval - 1) % 8)
                pred = [0] * ncomp
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                ch_, cv = hv[ci]
                for v in range(cv):
                    for hh in range(ch_):
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch_ + hh) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qtabs[t], enc_dc[t], enc_ac[t],
                            pred[ci])
            nmcu += 1
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for t, qt in enumerate(qtabs):
        out.append(seg(0xDB, bytes([t]) + bytes(int(v) for v in qt[_ZIGZAG])))
    comps = b"".join(
        bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1])
        for ci in range(ncomp)
    )
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps))
    n_tables = 2 if ncomp == 3 else 1
    for t, (bits, values) in enumerate([_DC_LUMA, _DC_CHROMA][:n_tables]):
        out.append(seg(0xC4, bytes([t]) + bytes(bits[1:])
                       + bytes(values)))
    for t, (bits, values) in enumerate([_AC_LUMA, _AC_CHROMA][:n_tables]):
        out.append(seg(0xC4, bytes([0x10 | t]) + bytes(bits[1:])
                       + bytes(values)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos_comps = b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
    )
    out.append(seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00"))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


class _BitReader:
    """Entropy-segment bit reader with byte unstuffing and RST skip."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop filling, reset() consumes
                else:
                    break  # EOI or next segment
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                raise ValueError("truncated JPEG entropy stream")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def reset(self) -> None:
        """Consume an RSTn marker and byte-align (restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG bytes to an ``(h, w, channels)``
    uint8 array.  Grayscale decodes to channels=1; 3-component scans
    YCbCr→RGB.  Raises ``ValueError`` for EVERY malformed or unsupported
    input (progressive/arithmetic modes, non-interleaved multi-scan
    files, truncation, bad tables, out-of-range sampling factors,
    unknown component references) — callers degrade on one exception
    type."""
    try:
        return _decode_jpeg_impl(b)
    except ValueError:
        raise
    except (IndexError, KeyError, StopIteration, struct.error,
            OverflowError, ZeroDivisionError) as exc:
        # malformed streams hit these through slicing/table/unpack paths;
        # normalize so the documented degrade contract needs ONE type
        raise ValueError(
            f"corrupt JPEG ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_jpeg_impl(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG (marker desync)")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a marker
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1
        if pos >= len(b):
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = b[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG (segment length)")
        (seglen,) = struct.unpack(">H", b[pos:pos + 2])
        if pos + seglen > len(b):
            raise ValueError("truncated JPEG (segment body)")
        seg = b[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qtabs[tq] = vals[_UNZIGZAG]  # store raster order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                if len(bits) < 17 or len(values) < n:
                    raise ValueError("truncated JPEG (DHT)")
                htabs[(tc, th)] = _decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                h_, v_ = hv >> 4, hv & 0x0F
                # T.81 B.2.2: sampling factors are 1-4; 0 would divide
                # by zero in the upsample step (review r8), >4 is
                # out of spec
                if not (1 <= h_ <= 4 and 1 <= v_ <= 4):
                    raise ValueError(
                        f"corrupt JPEG (SOF sampling factors {h_}x{v_} "
                        f"for component {cid}; spec range is 1-4)"
                    )
                comps.append({"id": cid, "h": h_, "v": v_, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}): only "
                "baseline sequential (SOF0/SOF1) is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("corrupt JPEG (SOS before SOF)")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # a legal baseline file may carry one scan PER COMPONENT
                # (non-interleaved multi-scan); this decoder returns
                # after the first scan, which would silently yield a
                # grayscale Y plane for a color frame (review r8) —
                # refuse loudly so callers degrade instead
                raise ValueError(
                    f"multi-scan baseline JPEG not supported (scan has "
                    f"{ns} of the frame's {len(frame['comps'])} "
                    "components; only single-scan interleaved files "
                    "decode)"
                )
            scomps = []
            for si in range(ns):
                cs, tt = seg[1 + si * 2:3 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomps.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(b, pos, frame, scomps, qtabs, htabs,
                                restart)
    raise ValueError("truncated JPEG (no SOS)")


def _decode_scan(b, pos, frame, scomps, qtabs, htabs, restart):
    fh, fw = frame["h"], frame["w"]
    if len(scomps) == 1:
        # T.81 A.2: a ONE-component scan is NON-interleaved — the MCU is
        # a single data unit and the component covers the frame at its
        # own full block grid, regardless of declared sampling factors.
        # (The interleaved loop below would mis-tile a single-component
        # frame whose SOF declares h=v=2, as some encoders emit.)
        hmax = vmax = 1
        scomps = [(dict(scomps[0][0], h=1, v=1), scomps[0][1],
                   scomps[0][2])]
    else:
        hmax = max(c["h"] for c, _, _ in scomps)
        vmax = max(c["v"] for c, _, _ in scomps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c, _, _ in scomps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    rd = _BitReader(b, pos)
    pred = [0] * len(scomps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                rd.reset()
                pred = [0] * len(scomps)
            for si, (c, tdc, tac) in enumerate(scomps):
                dct = htabs.get((0, tdc))
                act = htabs.get((1, tac))
                if dct is None or act is None:
                    raise ValueError("missing Huffman table for scan")
                qt = qtabs[c["tq"]].astype(np.float64)
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = rd.huff(dct)
                        diff = _extend(rd.bits(size), size)
                        pred[si] += diff
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG (AC index overflow)")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        coef = (zz[_UNZIGZAG].astype(np.float64)
                                * qt).reshape(8, 8)
                        block = _C.T @ coef @ _C + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = block
            nmcu += 1
    # upsample to full resolution and crop
    full = []
    for (c, _, _), p in zip(scomps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 3:
        y, cb, cr = full
        cb = cb - 128.0
        cr = cr - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        out = np.stack([r, g, bl], axis=-1)
    elif len(full) == 1:
        out = full[0][:, :, None]
    else:
        out = np.stack(full, axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
