"""Multimodal plumbing: real binary columns through Arrow-batched
mapInPandas, codec-free metadata extraction, stub gating."""

from __future__ import annotations

import struct

import pytest

from fhir_etl_spark.operators.multimodal import (
    decode_image,
    extract_media_meta,
    fake_image_features,
    sniff_mime,
)


def minimal_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    ihdr = struct.pack(">II", width, height) + bytes([bit_depth, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # fake crc — header parse doesn't check it
    )


def _media_df(spark):
    rows = [
        (1, minimal_png(640, 480)),
        (2, b"\xff\xd8\xff\xe0" + b"\x00" * 32),
        (3, b"RIFF" + b"\x00" * 4 + b"WAVE" + b"\x00" * 16),
        (4, b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16),
        (5, None),
        (6, b"just some text bytes"),
    ]
    return spark.createDataFrame(rows, "id long, media binary")


def test_extract_media_meta(spark):
    out = {
        r["id"]: r["media_meta"]
        for r in extract_media_meta(_media_df(spark)).collect()
    }
    assert out[1]["mime"] == "image/png"
    assert (out[1]["width"], out[1]["height"], out[1]["bit_depth"]) == (640, 480, 8)
    assert out[2]["mime"] == "image/jpeg"
    assert out[3]["mime"] == "audio/wav"
    assert out[4]["mime"] == "video/mp4"
    assert out[5] is None or out[5]["mime"] is None
    assert out[6]["mime"] == "application/octet-stream"
    assert out[6]["n_bytes"] == 20
    assert len(out[6]["digest"]) == 32


def test_fake_features_feed_similarity(spark):
    """binary → feature vector → cosine top-k: the full multimodal-to-ANN
    pipeline shape with the deterministic fake extractor."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.similarity import cosine_topk

    df = fake_image_features(_media_df(spark).filter("media is not null"), dim=8)
    corpus = df.select(F.col("id").alias("vec_id"), F.col("features").alias("embedding"))
    queries = corpus.filter("vec_id = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(corpus, queries, k=2).collect()
    assert top[0]["vec_id"] == 1 and top[0]["sim"] == 1.0  # self-match first


def test_decode_stub_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image(_media_df(spark))


def test_mime_sniff_unit():
    assert sniff_mime(None) is None
    assert sniff_mime(b"GIF89a...") == "image/gif"

def minimal_jpeg(width: int, height: int, precision: int = 8) -> bytes:
    """SOI + APP0 + (stray fill byte) + SOF0 + EOI — enough structure to
    exercise the marker walk, including a segment to skip."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([precision])
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + b"\xff" + sof0 + b"\xff\xd9"


def minimal_gif(width: int, height: int, bpp: int = 8) -> bytes:
    import struct

    packed = ((bpp - 1) & 0x07) << 4
    return b"GIF89a" + struct.pack("<HH", width, height) + bytes([packed, 0, 0]) + b"\x00;"


def test_image_dimensions_all_formats():
    """PNG IHDR, JPEG SOF walk, GIF LSD — width/height without PIL."""
    from fhir_etl_spark.operators.multimodal import (
        gif_dimensions,
        image_dimensions,
        jpeg_dimensions,
    )

    assert image_dimensions(minimal_png(640, 480)) == (640, 480, 8)
    assert image_dimensions(minimal_jpeg(1920, 1080)) == (1920, 1080, 8)
    assert image_dimensions(minimal_gif(320, 200, bpp=8)) == (320, 200, 8)
    # truncated/garbage inputs return Nones, never raise
    assert jpeg_dimensions(b"\xff\xd8\xff") == (None, None, None)
    assert gif_dimensions(b"GIF89a\x01") == (None, None, None)
    assert image_dimensions(b"random bytes") == (None, None, None)


def test_extract_media_meta_jpeg_gif(spark):
    """The mapInPandas metadata pass fills width/height for all three
    header-parsed formats in one batch."""
    from fhir_etl_spark.operators.multimodal import extract_media_meta

    df = spark.createDataFrame(
        [(1, minimal_png(64, 32)), (2, minimal_jpeg(800, 600)), (3, minimal_gif(10, 20))],
        "id long, media binary",
    )
    out = {r["id"]: r["media_meta"] for r in extract_media_meta(df).collect()}
    assert (out[1]["mime"], out[1]["width"], out[1]["height"]) == ("image/png", 64, 32)
    assert (out[2]["mime"], out[2]["width"], out[2]["height"]) == ("image/jpeg", 800, 600)
    assert (out[3]["mime"], out[3]["width"], out[3]["height"]) == ("image/gif", 10, 20)


def minimal_wav(
    sample_rate: int, channels: int, bits: int, n_frames: int
) -> bytes:
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_audio_meta_unit():
    from fhir_etl_spark.operators.multimodal import sniff_mime, wav_audio_meta

    wav = minimal_wav(16000, 2, 16, n_frames=16000)  # exactly 1 s
    assert sniff_mime(wav) == "audio/wav"
    assert wav_audio_meta(wav) == (16000, 2, 16, 1000)
    # truncated/garbage inputs return Nones, never raise
    assert wav_audio_meta(b"RIFF\x00\x00\x00\x00WAVE") == (None, None, None, None)
    assert wav_audio_meta(b"not audio") == (None, None, None, None)


def test_extract_media_meta_wav(spark):
    """Audio rows fill sample_rate/channels/duration; image rows leave the
    audio fields NULL — one metadata pass covers both modalities."""
    from fhir_etl_spark.operators.multimodal import extract_media_meta

    df = spark.createDataFrame(
        [(1, minimal_wav(44100, 1, 16, n_frames=22050)), (2, minimal_png(8, 8))],
        "id long, media binary",
    )
    out = {r["id"]: r["media_meta"] for r in extract_media_meta(df).collect()}
    assert out[1]["mime"] == "audio/wav"
    assert (out[1]["sample_rate"], out[1]["channels"], out[1]["bit_depth"]) == (44100, 1, 16)
    assert out[1]["duration_ms"] == 500
    assert out[2]["sample_rate"] is None and out[2]["duration_ms"] is None
    assert out[2]["width"] == 8
