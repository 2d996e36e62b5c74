"""Multimodal column plumbing (north-star per BASELINE.json).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct alongside. The Spark-side plumbing — schema,
partition sizing, Arrow batch shape through mapInPandas — is real and
tested; the actual codec work is stubbed behind import-tries because the
decode libraries (PIL/av/soundfile) are not in this container.

What IS implemented without external libs (deterministic, content-based):
- magic-number sniffing (PNG/JPEG/GIF/RIFF-WAV/MP4) from the binary prefix
- header dimension parses: PNG IHDR, JPEG SOF marker walk, GIF logical
  screen descriptor (width/height/bit-depth, pure byte parsing)
- WAV RIFF chunk walk: sample rate / channels / bits / duration from the
  ``fmt `` and ``data`` chunks
- content digest + byte length as stable features

Scale notes: binary payloads dominate row size — the operators below keep
them out of shuffles (metadata extraction is a projection; grouping happens
on the extracted metadata, never on the bytes). `maxPartitionBytes` should
be sized so one Arrow batch of rows fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        # audio (RIFF/WAV fmt chunk); NULL for images
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined by the WAVE tag check below
    (b"\x00\x00\x00", "video/mp4"),  # ftyp box (loose)
]


def sniff_mime(data: bytes | None) -> str | None:
    if not data:
        return None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if len(data) > 11 and data[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mime in _MAGIC:
        if data.startswith(magic):
            return mime
    return "application/octet-stream"


def png_dimensions(data: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, bit_depth) from the PNG IHDR chunk (bytes 16-25)."""
    if len(data) < 26 or not data.startswith(b"\x89PNG"):
        return None, None, None
    width, height = _struct.unpack(">II", data[16:24])
    return width, height, data[24]


def jpeg_dimensions(data: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, bit_depth) by walking JPEG markers to the first SOF.

    A JPEG is a sequence of 0xFF-prefixed marker segments; the frame header
    (SOF0–SOF15, excluding DHT/JPG/DAC 0xC4/0xC8/0xCC) carries
    [precision u8][height u16][width u16]. Pure byte walking — no codec.
    """
    if len(data) < 4 or not data.startswith(b"\xff\xd8"):
        return None, None, None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1  # padding/garbage between segments — resync
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone markers
            i += 2
            continue
        seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None, None, None
            precision = data[i + 4]
            height, width = _struct.unpack(">HH", data[i + 5 : i + 9])
            return width, height, precision
        i += 2 + seg_len
    return None, None, None


def gif_dimensions(data: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, bits_per_pixel) from the GIF logical screen
    descriptor (bytes 6-10 little-endian; packed byte bits 0-2 encode
    colour resolution as bpp-1)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None, None, None
    width, height = _struct.unpack("<HH", data[6:10])
    packed = data[10]
    bit_depth = ((packed >> 4) & 0x07) + 1
    return width, height, bit_depth


def wav_audio_meta(
    data: bytes,
) -> tuple[int | None, int | None, int | None, int | None]:
    """(sample_rate, channels, bits_per_sample, duration_ms) by walking the
    RIFF chunk list to ``fmt `` (and ``data`` for duration). Pure byte
    parsing — no codec. Chunks are [id u32][size u32 LE][payload, padded to
    even]; fmt carries [format u16][channels u16][sample_rate u32]
    [byte_rate u32][block_align u16][bits_per_sample u16].
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None, None, None, None
    sample_rate = channels = bits = None
    byte_rate = data_size = None
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = _struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            channels, sample_rate, byte_rate = _struct.unpack(
                "<HII", data[i + 10 : i + 20]
            )
            if i + 24 <= n:
                bits = _struct.unpack("<H", data[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are padded to even length
    duration_ms = None
    if byte_rate and data_size is not None:
        duration_ms = data_size * 1000 // byte_rate
    return sample_rate, channels, bits, duration_ms


def image_dimensions(data: bytes) -> tuple[int | None, int | None, int | None]:
    """Dispatch on magic number: PNG IHDR / JPEG SOF / GIF LSD — all pure
    byte parsing, no codec dependency."""
    if data.startswith(b"\x89PNG"):
        return png_dimensions(data)
    if data.startswith(b"\xff\xd8"):
        return jpeg_dimensions(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_dimensions(data)
    return None, None, None


def extract_media_meta(
    df: DataFrame, bytes_col: str = "media", out_col: str = "media_meta"
) -> DataFrame:
    """Attach the typed metadata struct via an Arrow-batched mapInPandas.

    Runs per-partition on Arrow batches (never per row through pickle);
    output schema = input schema + the metadata struct.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, MEDIA_META_SCHEMA)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for data in pdf[bytes_col]:
                raw = bytes(data) if data is not None else None
                if raw is None:
                    metas.append((None,) * 9)
                    continue
                width, height, depth = image_dimensions(raw)
                sample_rate, channels, bits, duration_ms = wav_audio_meta(raw)
                metas.append(
                    (
                        sniff_mime(raw),
                        len(raw),
                        hashlib.md5(raw).hexdigest(),
                        width,
                        height,
                        depth if depth is not None else bits,
                        sample_rate,
                        channels,
                        duration_ms,
                    )
                )
            meta_df = pd.DataFrame(
                metas,
                columns=[
                    "mime", "n_bytes", "digest", "width", "height",
                    "bit_depth", "sample_rate", "channels", "duration_ms",
                ],
            )
            pdf = pdf.reset_index(drop=True)
            pdf[out_col] = meta_df.to_dict("records")
            yield pdf

    return df.mapInPandas(batches, out_schema)


def decode_image(df: DataFrame, bytes_col: str = "media") -> DataFrame:
    """Decode to pixel arrays. STUB: requires an image codec library that is
    not in this container. The Spark plumbing (schema + batching) is what
    the engine provides; swap the inner function when PIL is available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow (not in this environment); "
            "use extract_media_meta for codec-free metadata, or "
            "fake_image_features for deterministic testing"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the dependency lands")


def fake_image_features(
    df: DataFrame, bytes_col: str = "media", dim: int = 8, out_col: str = "features"
) -> DataFrame:
    """Deterministic stand-in for a feature extractor: derives a dim-float
    vector from the content digest. The pipeline shape (binary → embedding
    column usable by operators/similarity.py) is exactly what a real model
    UDF produces; only the numbers are fake."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for data in pdf[bytes_col]:
                if data is None:
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(data)).digest()
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(dim)
                    ]
                )
            pdf = pdf.reset_index(drop=True)
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(batches, out_schema)


def resize_image(df: DataFrame, width: int, height: int, bytes_col: str = "media") -> DataFrame:
    """STUB: codec-dependent (see decode_image)."""
    raise NotImplementedError(
        "resize requires an image codec; plumbing contract: binary in, "
        "binary out, metadata width/height updated"
    )


def sample_video_frames(df: DataFrame, every_n: int = 30, bytes_col: str = "media") -> DataFrame:
    """STUB: container parsing requires av/ffmpeg (not in this image).
    Contract: one input row → N rows (frame_index, frame binary) via
    mapInPandas with an exploding batch function."""
    raise NotImplementedError("video frame sampling requires PyAV/ffmpeg")
