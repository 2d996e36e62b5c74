"""From-spec EXIF reader/writer (public: TIFF 6.0 + EXIF 2.3 — the APP1
``Exif\\x00\\x00`` payload is a TIFF byte stream: an 8-byte header
(endianness marker II/MM, magic 42, IFD0 offset) and chained Image File
Directories of 12-byte entries ``(tag u16, type u16, count u32,
value-or-offset u32)``, values ≤ 4 bytes packed in place).

Pure stdlib ``struct`` — no PIL/exifread in-container, and the point of
the codec tier is plumbing that is testable from the spec. The reader
supports both endiannesses and the types the common tags use (ASCII,
SHORT, LONG, RATIONAL) plus the Exif sub-IFD pointer (0x8769); the
writer builds deterministic fixtures for the m15 oracle.

Reference parity note: the reference has no image metadata path; this
is a north-star extension (corpus-scale EXIF extraction is the standard
first pass over a scraped image set — dedup on DateTime/Make, rotation
normalization from Orientation, resolution filters from the pixel
dimensions).
"""

from __future__ import annotations

import struct

# tag → (name, expected type) for the subset the operator surfaces
IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
}
EXIF_TAGS = {
    0x829A: "exposure",  # RATIONAL
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}
EXIF_IFD_POINTER = 0x8769

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _entry_bytes(
    endian: str, tag: int, typ: int, count: int, payload: bytes, heap: bytearray,
    heap_base: int,
) -> bytes:
    """One 12-byte IFD entry; payloads over 4 bytes go to the heap."""
    e = "<" if endian == "II" else ">"
    if len(payload) <= 4:
        val = payload + b"\x00" * (4 - len(payload))
    else:
        off = heap_base + len(heap)
        heap.extend(payload)
        val = struct.pack(f"{e}I", off)
    return struct.pack(f"{e}HHI", tag, typ, count) + val


def build_exif(
    make: str,
    model: str,
    orientation: int,
    datetime_str: str,
    exposure: tuple[int, int],
    pixel_x: int,
    pixel_y: int,
    endian: str = "II",
) -> bytes:
    """Deterministic EXIF APP1 payload (``Exif\\x00\\x00`` + TIFF): IFD0
    with make/model/orientation/datetime + the Exif sub-IFD with
    exposure (RATIONAL) and pixel dimensions."""
    if endian not in ("II", "MM"):
        raise ValueError(f"endian must be II|MM, got {endian!r}")
    e = "<" if endian == "II" else ">"

    def ascii_payload(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    # layout: TIFF header (8) | IFD0 | exif IFD | heap
    ifd0_entries = 5  # make, model, orientation, datetime, exif pointer
    exif_entries = 3
    ifd0_off = 8
    ifd0_size = 2 + 12 * ifd0_entries + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 12 * exif_entries + 4
    heap_base = exif_off + exif_size
    heap = bytearray()

    entries0 = [
        _entry_bytes(endian, 0x010F, 2, len(make) + 1,
                     ascii_payload(make), heap, heap_base),
        _entry_bytes(endian, 0x0110, 2, len(model) + 1,
                     ascii_payload(model), heap, heap_base),
        _entry_bytes(endian, 0x0112, 3, 1,
                     struct.pack(f"{e}H", orientation), heap, heap_base),
        _entry_bytes(endian, 0x0132, 2, len(datetime_str) + 1,
                     ascii_payload(datetime_str), heap, heap_base),
        _entry_bytes(endian, EXIF_IFD_POINTER, 4, 1,
                     struct.pack(f"{e}I", exif_off), heap, heap_base),
    ]
    entries_exif = [
        _entry_bytes(endian, 0x829A, 5, 1,
                     struct.pack(f"{e}II", *exposure), heap, heap_base),
        _entry_bytes(endian, 0xA002, 4, 1,
                     struct.pack(f"{e}I", pixel_x), heap, heap_base),
        _entry_bytes(endian, 0xA003, 4, 1,
                     struct.pack(f"{e}I", pixel_y), heap, heap_base),
    ]
    tiff = bytearray()
    tiff += (b"II" if endian == "II" else b"MM") + struct.pack(f"{e}H", 42)
    tiff += struct.pack(f"{e}I", ifd0_off)
    tiff += struct.pack(f"{e}H", ifd0_entries) + b"".join(entries0)
    tiff += struct.pack(f"{e}I", 0)  # no IFD1
    tiff += struct.pack(f"{e}H", exif_entries) + b"".join(entries_exif)
    tiff += struct.pack(f"{e}I", 0)
    tiff += heap
    return b"Exif\x00\x00" + bytes(tiff)


def build_jpeg_with_exif(exif_payload: bytes) -> bytes:
    """Minimal JPEG container holding the APP1 segment (SOI + APP1 +
    EOI) — enough for metadata extraction, which never decodes pixels."""
    seg = struct.pack(">H", len(exif_payload) + 2) + exif_payload
    return b"\xff\xd8" + b"\xff\xe1" + seg + b"\xff\xd9"


def _read_ifd(
    data: bytes, e: str, off: int, wanted: dict[int, str],
    visited: set[int] | None = None,
) -> dict:
    out: dict[str, object] = {}
    visited = set() if visited is None else visited
    if off in visited:
        raise ValueError(f"cyclic IFD chain at offset {off}")
    visited.add(off)
    if off + 2 > len(data):
        raise ValueError(f"IFD offset {off} beyond EXIF payload")
    (n,) = struct.unpack_from(f"{e}H", data, off)
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError(f"truncated IFD entry at {base}")
        tag, typ, count = struct.unpack_from(f"{e}HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip, per TIFF §2 reader guidance
        total = size * count
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(f"{e}I", data, base + 8)
        if voff + total > len(data):
            raise ValueError(f"tag 0x{tag:04x} value beyond payload")
        if tag == EXIF_IFD_POINTER:
            (sub,) = struct.unpack_from(f"{e}I", data, voff)
            out.update(_read_ifd(data, e, sub, EXIF_TAGS, visited))
            continue
        name = wanted.get(tag)
        if name is None:
            continue
        if typ == 2:  # ASCII, NUL-terminated
            raw = data[voff : voff + count]
            out[name] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            out[name] = struct.unpack_from(f"{e}H", data, voff)[0]
        elif typ == 4:
            out[name] = struct.unpack_from(f"{e}I", data, voff)[0]
        elif typ == 5:
            num, den = struct.unpack_from(f"{e}II", data, voff)
            out[name] = (num, den)
    return out


def parse_exif(data: bytes) -> dict:
    """Parse an EXIF payload (with or without the ``Exif\\x00\\x00``
    prefix) or a JPEG containing an APP1 Exif segment. Returns the
    surfaced tag dict; raises ValueError on malformed structures.

    Every malformed input surfaces as ValueError — including truncated
    streams (struct.error is rewrapped) and cyclic sub-IFD pointers —
    so extract_exif's per-row error contract holds against adversarial
    scraped blobs."""
    try:
        return _parse_exif_inner(data)
    except struct.error as exc:  # truncated stream mid-unpack
        raise ValueError(f"truncated EXIF/TIFF stream: {exc}") from exc


def _parse_exif_inner(data: bytes) -> dict:
    if data[:2] == b"\xff\xd8":  # JPEG: walk segments for APP1/Exif
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                raise ValueError(f"bad JPEG marker at {i}")
            marker = data[i + 1]
            if marker in (0xD9, 0xDA):  # EOI, or SOS — entropy-coded data
                # follows SOS, not segments: stop scanning (an EXIF APP1
                # always precedes the scan per EXIF 2.3 §4.5.4)
                break
            (seg_len,) = struct.unpack_from(">H", data, i + 2)
            if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
                data = data[i + 4 : i + 2 + seg_len]
                break
            i += 2 + seg_len
        else:
            raise ValueError("no APP1/Exif segment found")
        if data[:2] == b"\xff\xd8":
            raise ValueError("no APP1/Exif segment found")
    if data[:6] == b"Exif\x00\x00":
        data = data[6:]
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"not a TIFF stream: {data[:2]!r}")
    (magic,) = struct.unpack_from(f"{e}H", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (ifd0,) = struct.unpack_from(f"{e}I", data, 4)
    return _read_ifd(data, e, ifd0, IFD0_TAGS)
