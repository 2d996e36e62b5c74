"""Pure-Python GIF codec (GIF87a/89a, LZW) — the last image tier that was
container-only: `split_gif_frames` (operators/multimodal.py) re-wraps
frames without touching pixels; this module decodes them.

Implemented from the public specification (GIF89a spec / CompuServe
GIF87a; LZW per the spec's variable-code-size variant):

- decoder: header + logical screen descriptor, global/local color
  tables, extension skip (a GCE transparency index decodes as its
  palette color — cross-frame compositing is the caller's concern),
  image descriptor, INTERLACED row reordering (the 4-pass
  8/8-4/8-2/4-1/2 scheme), and the LZW decompressor — LSB-first bit
  packing, clear/end codes, code width growth to 12 bits, the KwKwK
  (code == next_free) case, early table reset. Output: palette indices
  mapped through the active color table → (H, W, 3) uint8 RGB.
- encoder (`encode_gif`): single- or multi-frame GIFs from palette
  index arrays — the test fixture writer and the m12 oracle anchor
  (LZW is LOSSLESS, so encode→decode must reproduce the formula image
  EXACTLY, unlike the JPEG tier's closed-form-lossy oracle).

Scale note: like png.py/jpeg.py this runs inside Arrow batches in
`decode_image` — per-image work, embarrassingly parallel, no shuffle.

Reference parity: the reference stores attachments opaquely; pixel
decode is the engine's multimodal-training extension.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit order, variable code width 3..12)
# --------------------------------------------------------------------------


def lzw_decompress(
    data: bytes, min_code_size: int, max_symbols: int | None = None
) -> list[int]:
    """GIF LZW byte stream (already de-sub-blocked) → palette index list.

    ``max_symbols`` caps the output (callers pass the image's pixel
    count): LZW expands up to ~1000× (measured), so without the cap a
    few-MB crafted stream with a tiny image descriptor is a
    decompression bomb that OOMs the worker BEFORE decode_gif's
    pixel-count check — an OOM-killed python worker fails the whole
    batch, violating the per-row error contract."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]  # clear/end sentinels

    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # streams may omit the explicit end code at the boundary
                return out
            acc |= data[pos] << nbits  # LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out.extend(entry)
        # slack of two max-length entries: sloppy real-world encoders
        # emit a few trailing pixels past the raster (tolerated and
        # truncated by the caller); a bomb overshoots by orders of
        # magnitude and stops here
        if max_symbols is not None and len(out) > max_symbols + 8192:
            raise ValueError(
                f"LZW stream exceeds {max_symbols} pixels (decompression bomb)"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """Palette indices → GIF LZW bytes (clear-code led, end-code
    terminated, table reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple[int, ...] = ()
    for sym in indices:
        if not 0 <= sym < clear:
            raise ValueError(f"index {sym} out of range for {min_code_size}-bit LZW")
        cand = run + (sym,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (sym,)
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap bytes into ≤255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """Palette-index frames (each (H, W) uint8, same size) + palette
    ((N, 3) uint8, N a power of two ≥ 2) → GIF89a bytes (global color
    table, one image block per frame). ``interlace`` stores rows in the
    4-pass interlaced order (decoder must undo it)."""
    if not frames:
        raise ValueError("need at least one frame")
    n_colors = palette.shape[0]
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError(
            f"palette size must be a power of two in [2, 256], got {n_colors}"
        )
    h, w = frames[0].shape
    depth = max(n_colors.bit_length() - 1, 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (depth - 1))  # GCT present, size
    out += b"\x00\x00"  # background, aspect
    out += palette.astype(np.uint8).tobytes()

    mcs = max(depth, 2)
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)
        rows = _interlace_order(h) if interlace else range(h)
        idx = np.concatenate([frame[r] for r in rows]).astype(np.uint8)
        out.append(mcs)
        out += _sub_blocks(lzw_compress(idx.tolist(), mcs))
    out.append(0x3B)
    return bytes(out)


def _interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace row order (rows 0,8,16.. then 4,12.. then
    2,6,10.. then 1,3,5..)."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def decode_gif(data: bytes) -> np.ndarray:
    """First image block of a GIF → (H, W, 3) uint8 RGB at the LOGICAL
    SCREEN size, via the active color table (local overrides global). A
    frame positioned inside a larger screen (non-zero left/top or smaller
    dims — GIF89a §20) is composited onto a background-color canvas
    rather than silently returned as the bare sub-rectangle (ADVICE r06).
    Handles interlacing; a GCE transparency index is decoded as its
    palette color (compositing ACROSS frames is the caller's concern —
    split_gif_frames emits frames as stored). Raises ValueError on
    corrupt/truncated streams or a frame exceeding the screen."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw_ct = data[13 : 13 + 3 * n]
        if len(raw_ct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = np.frombuffer(raw_ct, np.uint8).reshape(n, 3)
        i = 13 + 3 * n
    while i < len(data):
        b0 = data[i]
        if b0 == 0x3B:
            break
        if b0 == 0x21:  # extension — skip sub-block chain
            j = i + 2
            while j < len(data) and data[j] != 0:
                j += 1 + data[j]
            i = j + 1
        elif b0 == 0x2C:
            if i + 10 > len(data):
                raise ValueError("truncated image descriptor")
            left, top, fw, fh = struct.unpack("<HHHH", data[i + 1 : i + 9])
            flags = data[i + 9]
            j = i + 10
            ct = gct
            if flags & 0x80:
                n = 2 << (flags & 0x07)
                raw_ct = data[j : j + 3 * n]
                if len(raw_ct) != 3 * n:
                    raise ValueError("truncated local color table")
                ct = np.frombuffer(raw_ct, np.uint8).reshape(n, 3)
                j += 3 * n
            if ct is None:
                raise ValueError("no color table for image block")
            if j >= len(data):
                raise ValueError("truncated LZW header")
            mcs = data[j]
            j += 1
            lzw = bytearray()
            while j < len(data) and data[j] != 0:
                ln = data[j]
                lzw += data[j + 1 : j + 1 + ln]
                j += 1 + ln
            indices = lzw_decompress(bytes(lzw), mcs, max_symbols=fw * fh)
            if len(indices) < fw * fh:
                raise ValueError(
                    f"LZW stream yields {len(indices)} pixels, need {fw * fh}"
                )
            idx = np.array(indices[: fw * fh], np.uint16).reshape(fh, fw)
            if flags & 0x40:  # interlaced: rows are stored pass-ordered
                out = np.empty_like(idx)
                out[_interlace_order(fh)] = idx
                idx = out
            if int(idx.max(initial=0)) >= ct.shape[0]:
                raise ValueError("palette index out of range")
            rgb = ct[idx]
            if (left, top, fw, fh) == (0, 0, sw, sh):
                return rgb
            if left + fw > sw or top + fh > sh:
                raise ValueError("image block exceeds logical screen")
            bg_idx = data[11]
            bg = (
                gct[bg_idx]
                if gct is not None and bg_idx < gct.shape[0]
                else np.zeros(3, np.uint8)
            )
            canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
            canvas[top : top + fh, left : left + fw] = rgb
            return canvas
        else:
            raise ValueError(f"corrupt GIF block 0x{b0:02x} at {i}")
    raise ValueError("no image block in GIF")
