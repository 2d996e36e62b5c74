"""Pure numpy baseline JPEG codec (ITU-T T.81 sequential DCT, SOF0).

The container has no libjpeg/PIL, so — like the PNG tier
(functions/png.py) — the codec is implemented from the public spec:
marker segments, Annex K quantization + Huffman tables, level shift,
8×8 forward/inverse DCT, zigzag, DC-difference + run-length/EOB entropy
coding with 0xFF byte stuffing. This closes the one media tier round 4
left honestly gated ("JPEG pixel decode needs a DCT codec").

Scope (covering effectively every real-world training-corpus JPEG):
- decoder: baseline/extended sequential (SOF0/SOF1) AND progressive
  (SOF2 — spectral selection, successive approximation, DC/AC first +
  refinement scans, EOB runs, per T.81 Annex G), 8-bit, grayscale or
  3-component YCbCr with any DIVISIBLE sampling factors (generic MCU
  walk — 4:4:4, 4:2:2 and 4:2:0 all fall out of it; non-divisible
  combos like 3-vs-2, which no mainstream encoder emits, are rejected
  at SOF parse since upsampling is integer replication), restart
  markers (DRI/RSTn),
  multi-table DQT/DHT segments. Arithmetic coding, 12-bit, lossless and
  hierarchical profiles raise.
- encoder: grayscale or RGB→YCbCr (4:4:4 or 4:2:0) at a libjpeg-style
  integer ``quality`` scaling of the Annex K tables; sequential by
  default, or a 6-scan progressive script (``progressive=True``) that
  must decode pixel-identical to its sequential twin — the test anchor
  for the whole multi-scan path.

Correctness anchors (no external codec exists in-container to diff
against byte-for-byte):
- the m6 driver query value-oracles the DCT/quantization arithmetic in
  closed form: constant 8×8 tiles are DC-only, so the decoded value is
  exactly clip(round(round(8·(v−128)/q00)·q00/8)+128) — replayed in SQL;
- round-trip property tests (tests/test_multimodal.py) bound the error
  of random images by the quantization step;
- the emitted headers are re-parsed by the INDEPENDENT marker walker
  ``operators/multimodal.jpeg_dimensions`` (written in round 3, before
  this codec existed).

All rounding is half-away-from-zero (``_round_half_away``), matching
DuckDB's ``round()`` so the m6 oracle replays bit-exactly.

Reference parity: the reference stores attachments opaquely
(document_references.py:125-153); pixel decode is the engine's
multimodal-training extension.

Runs inside Arrow-batched mapInPandas workers: entropy coding is
per-block Python (inherent — it is a serial bitstream), but the DCT/IDCT
is batched over all blocks of an image in one numpy tensordot.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# --------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K — public spec appendix)
# --------------------------------------------------------------------------

#: zigzag scan order: position k of the scan reads row-major index ZIGZAG[k]
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

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

# Huffman table specs: (BITS[1..16] code-length histogram, HUFFVAL symbols)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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

# Orthonormal 8-point DCT-II basis: T @ block @ T.T is the 2-D forward
# transform with DC = 8 * mean-shifted value (T.81 A.3.3 up to the
# separable factorization).
_DCT_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (DuckDB round() semantics — NOT numpy's
    banker's rounding), so the m6 closed-form oracle replays exactly."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base quantization table:
    scale = 5000/q (q<50) else 200−2q; entry = clip((base·scale+50)/100, 1, 255).
    Integer arithmetic; public formula (IJG jcparam.c / widely documented)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman codes from a BITS histogram + symbol list
    (T.81 C.2): returns {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # over-subscribed BITS histogram (corrupt DHT) — reject
                # here with a clear error; the 16-bit fast-table build
                # would otherwise die on an out-of-range index
                raise ValueError(
                    f"invalid DHT: {bits[length - 1]} codes overflow "
                    f"length {length}"
                )
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffTable:
    """Decoder-side Huffman table: a full 16-bit-prefix lookup (``fast``:
    65536 entries of (symbol, code_length), None = invalid prefix) plus
    the {(length, code): symbol} map (``slow``) for the stream-tail path
    where fewer than 16 bits remain before a marker. Table-driven decode
    replaces the bit-at-a-time tree walk — one peek + one list index per
    symbol instead of up to 16 dict probes (measured 3–4× on the whole
    decoder)."""

    __slots__ = ("fast", "slow")

    def __init__(self, fast: list, slow: dict):
        self.fast = fast
        self.slow = slow


@lru_cache(maxsize=64)
def _decode_table_cached(bits: tuple, vals: tuple) -> _HuffTable:
    codes = _build_huffman(list(bits), list(vals))
    slow = {(ln, code): sym for sym, (code, ln) in codes.items()}
    fast: list = [None] * (1 << 16)
    for sym, (code, ln) in codes.items():
        base = code << (16 - ln)
        entry = (sym, ln)
        for suffix in range(1 << (16 - ln)):
            fast[base | suffix] = entry
    return _HuffTable(fast, slow)


def _decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """Build (or fetch from the cross-image cache — real corpora reuse
    the same DHTs, e.g. the Annex K defaults — the 65536-entry build
    amortizes to once per distinct table) the decoder Huffman table."""
    return _decode_table_cached(tuple(bits), tuple(vals))


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs 0xFF00
    and surfaces RSTn markers to the MCU loop.

    Invariant: ``_acc`` holds exactly ``_n`` valid low bits (masked after
    every consume) — without the mask the accumulator grows by 8 bits per
    input byte forever and Python big-int shifts turn the scan loop
    quadratic. ``peek16``/``consume`` are the table-driven decode's fast
    path; both fall back to the per-bit path near markers."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # pending RSTn/EOI-class marker

    def _fill_soft(self) -> bool:
        """Buffer one more byte; False (no state change) at a marker or
        end of data."""
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt != 0x00:  # a real marker: stop producing bits
                return False
            self.pos += 2  # stuffed literal 0xFF
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._n += 8
        return True

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        if not self._fill_soft():
            self.marker = self.data[self.pos + 1] if self.pos + 1 < len(
                self.data
            ) else None
            raise ValueError("hit marker inside entropy decode")

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        v = (self._acc >> self._n) & 1
        self._acc &= (1 << self._n) - 1
        return v

    def peek16(self) -> int | None:
        """Top 16 buffered bits without consuming, or None when a marker
        or end-of-data interrupts before 16 bits exist (tail path)."""
        while self._n < 16:
            if not self._fill_soft():
                return None
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def consume(self, nbits: int) -> None:
        self._n -= nbits
        self._acc &= (1 << self._n) - 1

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self._n < nbits:
            if not self._fill_soft():
                self._fill()  # raises with the old marker/truncation semantics
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def align_to_marker(self) -> int:
        """Discard bits to the next marker (used at restart intervals);
        returns the marker's second byte."""
        self._acc = 0
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return marker
            self.pos += 1
        raise ValueError("expected restart marker, hit end of data")


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    w = reader.peek16()
    if w is not None:
        entry = table.fast[w]
        if entry is None:
            raise ValueError("invalid Huffman code")
        reader.consume(entry[1])
        return entry[0]
    # stream tail: fewer than 16 bits before a marker — per-bit walk
    slow = table.slow
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = slow.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _magnitude_bits(value: int) -> tuple[int, int]:
    """(category, raw bits) per T.81 F.1.2.1: negatives store value−1's
    low ``category`` bits."""
    if value == 0:
        return 0, 0
    size = int(abs(value)).bit_length()
    if value < 0:
        value += (1 << size) - 1
    return size, value


def _extend(raw: int, size: int) -> int:
    """Inverse of _magnitude_bits (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if raw < (1 << (size - 1)):
        return raw - (1 << size) + 1
    return raw


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane, H/W multiples of 8 → (n_blocks, 8, 8) in
    raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range conversion; float planes (rounding happens once,
    after the DCT quantization, not here)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _encode_plane_coeffs(plane: np.ndarray, qtable_zz: np.ndarray) -> np.ndarray:
    """Plane → (n_blocks, 64) quantized zigzag coefficients. The DCT is
    batched over every block in one tensordot; only entropy coding stays
    per-block."""
    blocks = _to_blocks(_pad_edge(plane.astype(np.float64)) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_T, blocks, _DCT_T)
    zz = coeffs.reshape(-1, 64)[:, ZIGZAG]
    return _round_half_away(zz / qtable_zz).astype(np.int64)


def _entropy_encode_block(
    writer: _BitWriter, zz: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict
) -> int:
    """One block's DC-diff + AC RLE Huffman bits; returns the new DC
    predictor.

    Hot path (profiled at ~90% of encode time before round 6): the block
    converts to a Python list ONCE (no per-coefficient numpy scalar
    boxing), the magnitude-category math is inlined (saves 150k+
    _magnitude_bits calls per 30 images), and each symbol's Huffman code
    and raw magnitude bits are fused into a single writer.write call."""
    vals = zz.tolist()
    dc = vals[0]
    diff = dc - pred
    size = (diff if diff >= 0 else -diff).bit_length()
    raw = diff + (1 << size) - 1 if diff < 0 else diff
    code, ln = dc_codes[size]
    writer.write((code << size) | raw, ln + size)

    last = 63
    while last > 0 and vals[last] == 0:
        last -= 1
    run = 0
    write = writer.write
    for k in range(1, last + 1):
        v = vals[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL: 16 zeros
            write(zc, zl)
            run -= 16
        size = (v if v >= 0 else -v).bit_length()
        raw = v + (1 << size) - 1 if v < 0 else v
        code, ln = ac_codes[(run << 4) | size]
        write((code << size) | raw, ln + size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        write(code, ln)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + struct.pack(">H", len(payload) + 2) + payload


def _emit_ac_first_block(writer, zz, ss, se, al, ac_codes) -> None:
    """One block of a progressive AC first scan (Ah=0): band-limited RLE
    of the point-transformed coefficients, EOB0 per block (no cross-block
    EOB runs — less compact, decoder-identical)."""
    vals = [int(np.sign(zz[k])) * (abs(int(zz[k])) >> al) for k in range(ss, se + 1)]
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        size, raw = _magnitude_bits(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(raw, size)
        run = 0
    if last < len(vals) - 1:
        code, ln = ac_codes[0x00]  # EOB0
        writer.write(code, ln)


def _emit_ac_refine_block(writer, zz, ss, se, al, ac_codes) -> None:
    """One block of a progressive AC refinement scan (Ah=Al+1): newly
    significant coefficients (|c|>>al == 1) terminate zero-history runs;
    already-significant ones buffer a correction bit that is flushed
    after the next emitted symbol (mirroring the decoder's consumption
    order); EOB0 per block flushes the tail."""
    p_pending: list[int] = []
    run = 0

    def _flush_pending():
        for b in p_pending:
            writer.write(b, 1)
        p_pending.clear()

    for k in range(ss, se + 1):
        c = int(zz[k])
        t = abs(c) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:  # drain zero-history runs before buffering this bit
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
            _flush_pending()
        if t > 1:  # already significant at the prior precision
            p_pending.append(t & 1)
            continue
        # newly significant: |c|>>al == 1
        code, ln = ac_codes[(run << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if c > 0 else 0, 1)
        _flush_pending()
        run = 0
    if run > 0 or p_pending:
        code, ln = ac_codes[0x00]  # EOB0: decoder tail-consumes the rest
        writer.write(code, ln)
        _flush_pending()


def _progressive_scans(
    out: bytearray,
    plane_coeffs: list[np.ndarray],
    plane_bw: list[int],
    gray: bool,
) -> None:
    """Emit the 6-scan progressive script (DC first Al=1 interleaved; AC
    first per band per component at Al=1; DC refine; AC refine per band
    per component) — exercising spectral selection AND successive
    approximation, including the correction-bit path."""
    dc_codes = [
        _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    ncomp = 1 if gray else 3

    def _sos(comps_in_scan, ss, se, ah, al, body: bytes) -> None:
        hdr = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            tid = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (tid << 4) | tid])
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(_marker(0xDA, hdr))
        out.extend(body)

    # scan 1: DC first, all components interleaved, Al=1
    writer = _BitWriter()
    preds = [0] * ncomp
    n_blocks = len(plane_coeffs[0])
    for b in range(n_blocks):  # 4:4:4/gray: MCU == one block per component
        for ci in range(ncomp):
            v = int(plane_coeffs[ci][b][0]) >> 1  # arithmetic shift (T.81 G.1.2.1)
            size, raw = _magnitude_bits(v - preds[ci])
            code, ln = dc_codes[0 if ci == 0 else 1][size]
            writer.write(code, ln)
            writer.write(raw, size)
            preds[ci] = v
    writer.flush()
    _sos(list(range(ncomp)), 0, 0, 0, 1, bytes(writer.out))

    # scans 2..: AC first per band per component, Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            writer = _BitWriter()
            for zz in plane_coeffs[ci]:
                _emit_ac_first_block(writer, zz, ss, se, 1, ac_codes[0 if ci == 0 else 1])
            writer.flush()
            _sos([ci], ss, se, 0, 1, bytes(writer.out))

    # DC refinement: one bit per block, interleaved
    writer = _BitWriter()
    for b in range(n_blocks):
        for ci in range(ncomp):
            writer.write(int(plane_coeffs[ci][b][0]) & 1, 1)
    writer.flush()
    _sos(list(range(ncomp)), 0, 0, 1, 0, bytes(writer.out))

    # AC refinement per band per component
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            writer = _BitWriter()
            for zz in plane_coeffs[ci]:
                _emit_ac_refine_block(
                    writer, zz, ss, se, 0, ac_codes[0 if ci == 0 else 1]
                )
            writer.flush()
            _sos([ci], ss, se, 1, 0, bytes(writer.out))


def encode_jpeg(
    array: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (H, W), (H, W, 1) grayscale or (H, W, 3) RGB → baseline JPEG
    bytes (SOF0, Annex K tables scaled by ``quality``).

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2×2 luma blocks + 2×2-mean-downsampled chroma per MCU — the layout
    virtually every camera/web JPEG uses, so the decoder's generic MCU
    walk gets exercised by our own streams). ``restart_interval`` > 0
    emits DRI + RSTn markers every N MCUs (tests the decoder's restart
    resynchronization). ``progressive`` emits SOF2 with a 6-scan script
    (interleaved DC first at Al=1; per-component AC bands 1-5/6-63 at
    Al=1; DC + AC refinement scans) — same quantized coefficients, so a
    progressive stream must decode pixel-identical to its baseline twin;
    4:4:4/grayscale only and no restart intervals in this mode."""
    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg wants uint8, got {arr.dtype}")
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise ValueError(f"encode_jpeg wants (H,W)[,1|3], got {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    if progressive and (subsampling != "444" or restart_interval):
        raise ValueError(
            "progressive encoding supports 4:4:4/grayscale without restarts"
        )
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad dimensions {h}x{w}")
    gray = arr.ndim == 2

    q_luma = quality_scale(_QUANT_LUMA, quality)[ZIGZAG]
    q_chroma = quality_scale(_QUANT_CHROMA, quality)[ZIGZAG]

    # (hf, vf) per component + the float planes on their sampling grids
    if gray:
        factors = [(1, 1)]
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        if subsampling == "444":
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        else:  # 420: chroma = mean of each 2x2 (edge-padded to even first)
            factors = [(2, 2), (1, 1), (1, 1)]
            ph, pw = h + h % 2, w + w % 2
            padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
            planes = [ycc[..., 0]]
            for c in (1, 2):
                planes.append(
                    padded[..., c].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
    hmax = max(hf for hf, _ in factors)
    vmax = max(vf for _, vf in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    plane_coeffs, plane_bw = [], []
    for ci, ((hf, vf), plane) in enumerate(zip(factors, planes)):
        # pad every plane to its full MCU grid so the interleaved walk
        # never runs off the edge
        th, tw = mcus_y * vf * 8, mcus_x * hf * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        plane_coeffs.append(
            _encode_plane_coeffs(plane, q_luma if ci == 0 else q_chroma)
        )
        plane_bw.append(tw // 8)

    writer = _BitWriter()
    if not progressive:
        dc_l = _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)
        ac_l = _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)
        dc_c = _build_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        ac_c = _build_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        preds = [0] * len(planes)
        mcu_count = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0] * len(planes)
                for ci, zzs in enumerate(plane_coeffs):
                    hf, vf = factors[ci]
                    for byy in range(vf):
                        for bxx in range(hf):
                            idx = (my * vf + byy) * plane_bw[ci] + (mx * hf + bxx)
                            preds[ci] = _entropy_encode_block(
                                writer,
                                zzs[idx],
                                preds[ci],
                                dc_l if ci == 0 else dc_c,
                                ac_l if ci == 0 else ac_c,
                            )
                mcu_count += 1
        writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0]) + bytes(q_luma.tolist()))
    if not gray:
        out += _marker(0xDB, bytes([1]) + bytes(q_chroma.tolist()))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hf, vf = factors[ci]
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += _marker(0xC2 if progressive else 0xC0, sof)

    def _dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += _dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if progressive:
        _progressive_scans(out, plane_coeffs, plane_bw, gray)
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += _marker(0xDA, sos)
        out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _ScanState:
    """Everything a multi-scan (progressive) decode accumulates: parsed
    tables, frame geometry, and per-component quantized-coefficient arrays
    in zigzag index space, sized to the full MCU grid."""

    def __init__(self) -> None:
        self.qtables: dict[int, np.ndarray] = {}
        # per-component quant-table SNAPSHOT taken at the component's
        # first SOS (libjpeg semantics): a spec-legal DQT redefinition
        # between scans must not retroactively re-dequantize earlier
        # scans' coefficients.
        self.qsnap: dict[int, np.ndarray] = {}
        self.htables: dict[tuple[int, int], dict] = {}
        self.restart_interval = 0
        self.frame = None  # (h, w, [(cid, hf, vf, tq)], progressive)
        self.coefs: list[np.ndarray] = []  # per comp: (n_by, n_bx, 64) int64
        self.preds: list[int] = []
        self.eobrun = 0

    def alloc(self) -> None:
        h, w, comps, _ = self.frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        self.mcus_x, self.mcus_y, self.hmax, self.vmax = mcus_x, mcus_y, hmax, vmax
        for _, hf, vf, _ in comps:
            self.coefs.append(np.zeros((mcus_y * vf, mcus_x * hf, 64), np.int64))


def _effective_blocks(st: _ScanState, ci: int) -> tuple[int, int]:
    """Non-interleaved scans cover the component's true sampling area,
    NOT the MCU-padded grid (T.81 A.2.2)."""
    h, w, comps, _ = st.frame
    _, hf, vf, _ = comps[ci]
    cw = (w * hf + st.hmax - 1) // st.hmax
    ch = (h * vf + st.vmax - 1) // st.vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_block_baseline(reader, st, si, ci, zz, dc_tbl, ac_tbl) -> None:
    t = _huff_decode(reader, dc_tbl)
    diff = _extend(reader.receive(t), t)
    st.preds[si] += diff
    zz[0] = st.preds[si]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.receive(s), s)
        k += 1


def _decode_block_dc(reader, st, si, zz, dc_tbl, ah, al) -> None:
    if ah == 0:  # first DC scan: diffs at reduced precision, then shift up
        t = _huff_decode(reader, dc_tbl)
        st.preds[si] += _extend(reader.receive(t), t)
        zz[0] = st.preds[si] << al
    else:  # refinement: one bit per block (two's-complement OR, as in C)
        if reader.bit():
            zz[0] |= 1 << al


def _decode_block_ac_first(reader, st, zz, ac_tbl, ss, se, al) -> None:
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: this block is done, r more follow
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += reader.receive(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(reader.receive(s), s) * (1 << al)
            k += 1


def _decode_block_ac_refine(reader, st, zz, ac_tbl, ss, se, al) -> None:
    """T.81 G.2 AC successive-approximation refinement: new ±1<<al
    coefficients terminate runs of zero-HISTORY positions; every nonzero
    position passed (and, on EOB, every one remaining) consumes a
    correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn: fall through to the correction tail
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                val = p1 if reader.bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                zz[k] = val
            k += 1
    if st.eobrun > 0:  # correction bits for the rest of the block
        while k <= se:
            if zz[k] != 0 and reader.bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        st.eobrun -= 1


def _decode_scan(data, pos, st, scan_map, ss, se, ah, al) -> int:
    """Entropy-decode one scan starting at ``pos``; returns the position of
    the next marker. Handles interleaved (Ns>1) MCU order, non-interleaved
    single-component block order, and restart markers."""
    _h, _w, comps, progressive = st.frame
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("invalid progressive scan: DC scan must have Se=0")
        if ss > 0 and (len(scan_map) != 1 or not ss <= se <= 63):
            raise ValueError("invalid progressive AC scan header")
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("invalid sequential scan header")
    reader = _BitReader(data, pos)
    st.preds = [0] * len(scan_map)
    st.eobrun = 0
    interleaved = len(scan_map) > 1

    def _tables(dc_tid, ac_tid):
        dc_tbl = st.htables.get((0, dc_tid))
        ac_tbl = st.htables.get((1, ac_tid))
        if (ss == 0 and ah == 0 and dc_tbl is None) or (
            (not progressive or ss > 0) and ac_tbl is None and not (ss == 0 and se == 0)
        ):
            raise ValueError("scan references undefined Huffman table")
        return dc_tbl, ac_tbl

    def _decode_unit(si, ci, zz, dc_tbl, ac_tbl):
        if not progressive:
            _decode_block_baseline(reader, st, si, ci, zz, dc_tbl, ac_tbl)
        elif ss == 0:
            _decode_block_dc(reader, st, si, zz, dc_tbl, ah, al)
        elif ah == 0:
            _decode_block_ac_first(reader, st, zz, ac_tbl, ss, se, al)
        else:
            _decode_block_ac_refine(reader, st, zz, ac_tbl, ss, se, al)

    def _restart(unit_count):
        if (
            st.restart_interval
            and unit_count
            and unit_count % st.restart_interval == 0
        ):
            marker = reader.align_to_marker()
            if not 0xD0 <= marker <= 0xD7:
                raise ValueError(f"expected RSTn, got 0x{marker:02x}")
            st.preds = [0] * len(scan_map)
            st.eobrun = 0

    if interleaved:
        unit = 0
        for my in range(st.mcus_y):
            for mx in range(st.mcus_x):
                _restart(unit)
                for si, (ci, dc_tid, ac_tid) in enumerate(scan_map):
                    _, hf, vf, _tq = comps[ci]
                    dc_tbl, ac_tbl = _tables(dc_tid, ac_tid)
                    for byy in range(vf):
                        for bxx in range(hf):
                            zz = st.coefs[ci][my * vf + byy, mx * hf + bxx]
                            _decode_unit(si, ci, zz, dc_tbl, ac_tbl)
                unit += 1
    else:
        ci, dc_tid, ac_tid = scan_map[0]
        dc_tbl, ac_tbl = _tables(dc_tid, ac_tid)
        n_by, n_bx = _effective_blocks(st, ci)
        unit = 0
        for by in range(n_by):
            for bx in range(n_bx):
                _restart(unit)
                _decode_unit(0, ci, st.coefs[ci][by, bx], dc_tbl, ac_tbl)
                unit += 1

    # skip padding bits / stuffed bytes to the next marker
    pos = reader.pos
    while pos + 1 < len(data) and not (
        data[pos] == 0xFF and data[pos + 1] != 0x00
    ):
        pos += 1
    return pos


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 (H, W, C) array (C = 1 or 3; 3-component streams
    are converted YCbCr→RGB). Handles baseline sequential (SOF0, plus
    extended-sequential SOF1 — same entropy coding) and progressive (SOF2:
    spectral selection + successive approximation, DC/AC first and
    refinement scans, EOB runs, per T.81 Annex G). Raises ValueError on
    arithmetic/lossless/hierarchical/12-bit profiles and corrupt streams."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    st = _ScanState()
    pos = 2
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = data[pos + 1]
        if tag == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if tag == 0xD9:  # EOI
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD8:  # standalone markers
            pos += 2
            continue
        if tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG profile (SOF marker 0x{tag:02x}) — "
                "baseline (SOF0/1) and progressive (SOF2) Huffman only"
            )
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if tag == 0xDB:  # DQT: 1+ tables per segment
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.frombuffer(payload[i + 1 : i + 65], np.uint8).astype(np.int64)
                if tbl.size != 64:
                    raise ValueError("truncated DQT")
                st.qtables[tid] = tbl
                i += 65
        elif tag == 0xC4:  # DHT: 1+ tables per segment
            i = 0
            while i + 17 <= len(payload):
                cls, tid = payload[i] >> 4, payload[i] & 0x0F
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                st.htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif tag in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) or SOF2
            if st.frame is not None:
                raise ValueError("multiple SOF markers")
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component specs")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 4 and 1 <= vf <= 4):
                    raise ValueError(f"invalid SOF sampling factors {hf}x{vf}")
                comps.append((cid, hf, vf, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, hf, vf, _ in comps:
                # reconstruction upsamples by integer replication, so
                # only divisible ratios (1/2/4 — every real-world file)
                # are supported; reject 3-vs-2 style combos loudly
                # instead of dying later in np.stack on a shape error.
                if hmax % hf or vmax % vf:
                    raise ValueError(
                        f"unsupported sampling ratio {hf}x{vf} vs max "
                        f"{hmax}x{vmax} (non-integer upsampling)"
                    )
            st.frame = (h, w, comps, tag == 0xC2)
            st.alloc()
        elif tag == 0xDD:  # DRI
            (st.restart_interval,) = struct.unpack(">H", payload[:2])
        elif tag == 0xDA:  # SOS
            if st.frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_map = []
            cids = [c[0] for c in st.frame[2]]
            for si in range(ns):
                cid, tids = payload[1 + 2 * si], payload[2 + 2 * si]
                scan_map.append((cids.index(cid), tids >> 4, tids & 0x0F))
            ss_, se_, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            for ci_, _, _ in scan_map:
                if ci_ not in st.qsnap:
                    tbl = st.qtables.get(st.frame[2][ci_][3])
                    if tbl is not None:
                        st.qsnap[ci_] = tbl
            pos = _decode_scan(
                data, pos + 2 + seglen, st, scan_map,
                ss_, se_, ahal >> 4, ahal & 0x0F,
            )
            saw_scan = True
            continue
        pos += 2 + seglen
    if st.frame is None or not saw_scan:
        raise ValueError("no SOS/SOF found")

    # reconstruct: dequantize + de-zigzag + batched IDCT per component
    h, w, comps, _ = st.frame
    out_planes = []
    for ci, (_, hf, vf, tq) in enumerate(comps):
        q = st.qsnap.get(ci, st.qtables.get(tq))
        if q is None:
            raise ValueError("component references undefined quant table")
        n_by, n_bx = st.coefs[ci].shape[:2]
        blocks = np.zeros((n_by * n_bx, 64), np.float64)
        blocks[:, ZIGZAG] = (st.coefs[ci].reshape(-1, 64) * q).astype(np.float64)
        pix = (
            np.einsum(
                "xu,nuv,yv->nxy", _DCT_T.T, blocks.reshape(-1, 8, 8), _DCT_T.T
            )
            + 128.0
        )
        plane = (
            pix.reshape(n_by, n_bx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(n_by * 8, n_bx * 8)
        )
        # upsample by replication to the full sampling grid, then crop
        if hf != st.hmax or vf != st.vmax:
            plane = np.repeat(
                np.repeat(plane, st.vmax // vf, axis=0), st.hmax // hf, axis=1
            )
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        pixels = out_planes[0][:, :, None]
    else:
        pixels = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    return np.clip(_round_half_away(pixels), 0, 255).astype(np.uint8)


def dc_only_pixel(value: int, q00: int) -> int:
    """The closed-form decoded value of a constant 8×8 block: the DCT is
    DC-only (DC = 8·(v−128)), so encode→decode reduces to one quantize +
    dequantize + IDCT of a single coefficient. This is the arithmetic the
    m6 oracle replays in SQL; exported so tests can pin codec == formula."""
    shifted = 8 * (value - 128)
    dq = int(_round_half_away(np.float64(shifted) / q00)) * q00
    return int(np.clip(int(_round_half_away(np.float64(dq) / 8.0)) + 128, 0, 255))
