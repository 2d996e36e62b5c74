"""Round-5 scale smoke (VERDICT r04 next-round #2): drive the round-4
heavy operators at 10M+ token / 1M+ row / 100k+ image scale on local[32]
and print one timing line per operator. Synthetic inputs are generated
with pure Spark expressions (no driver-side data), so the smoke itself
exercises the same codegen paths the operators use.

Usage: python tools/scale_smoke_r05.py [smoke ...]
  smokes: d10 t12 v5 v7 m2   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = 1_000_000
TOKENS_PER_DOC = 30  # → 30M corpus tokens
N_VECS = 1_000_000
N_IMAGES = 100_000


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r05")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def synth_docs(spark, n=N_DOCS):
    """n docs × TOKENS_PER_DOC pseudo-random words from a 2000-word vocab;
    every 10th doc carries the same 12-token boilerplate span (planted
    ExactSubstr / perplexity structure)."""
    vocab = F.array(*[F.lit(f"w{i}") for i in range(2000)])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("id"), i), 2000) + 1).cast("int")
            ),
        ),
    )
    boiler = " ".join(f"b{i}" for i in range(12))
    text = F.when(
        F.col("id") % 10 == 0, F.concat(F.lit(boiler + " "), body)
    ).otherwise(body)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def synth_vecs(spark, n=N_VECS, dim=32, degenerate=20_000):
    """n embeddings; ids < degenerate are IDENTICAL (the v5 cap target);
    ids in [n/2, n/2+5000) duplicate ids [degenerate, degenerate+5000)
    exactly (planted near-dup pairs that must survive the cap)."""
    base_id = (
        F.when(F.col("id") < degenerate, F.lit(-1))  # one shared vector
        .when(
            (F.col("id") >= n // 2) & (F.col("id") < n // 2 + 5000),
            F.col("id") - n // 2 + degenerate,
        )
        .otherwise(F.col("id"))
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (F.pmod(F.xxhash64(base_id, j), 1000) / 500.0 - 1.0),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def smoke_d10(spark):
    from fhir_etl_spark.operators.dedup import substring_dedup

    docs = synth_docs(spark)
    t0 = time.perf_counter()
    out = substring_dedup(docs, k=8, gram_key="hash")
    stats = out.agg(
        F.count("*").alias("n"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_tokens").alias("total"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"d10_substring_dedup: {N_DOCS:,} docs / {stats['total']:,} tokens "
        f"in {dt:.1f}s — {stats['removed']:,} tokens removed "
        f"({100.0 * stats['removed'] / stats['total']:.1f}%)",
        flush=True,
    )


def smoke_t12(spark):
    from fhir_etl_spark.operators.text import lm_cross_entropy

    docs = synth_docs(spark)
    t0 = time.perf_counter()
    out = lm_cross_entropy(docs)
    stats = out.agg(
        F.count("*").alias("n"), F.round(F.avg("xent"), 3).alias("avg_xent")
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"t12_lm_perplexity: {N_DOCS:,} docs scored in {dt:.1f}s — "
        f"avg xent {stats['avg_xent']} over {stats['n']:,} rows",
        flush=True,
    )


def smoke_v5(spark):
    from fhir_etl_spark.operators.similarity import lsh_bucketed_neardup

    vecs = synth_vecs(spark)
    t0 = time.perf_counter()
    pairs = lsh_bucketed_neardup(
        vecs, threshold=0.999, n_planes=12, n_bands=4, dim=32,
        max_bucket_size=1000,
    )
    n = pairs.count()
    dt = time.perf_counter() - t0
    # the 20k-identical cluster would alone be 20k*(20k-1)/2 ≈ 2.0e8 pairs;
    # the cap must keep the result at the planted-duplicate scale instead
    print(
        f"v5_lsh_bucketed_neardup: {N_VECS:,} vecs in {dt:.1f}s — {n:,} pairs "
        f"(degenerate 20k-identical cluster capped out; uncapped lower bound "
        f"would be ~2.0e8 pairs)",
        flush=True,
    )


def smoke_v7(spark):
    from fhir_etl_spark.operators.similarity import kmeans_assign

    vecs = synth_vecs(spark, degenerate=0)
    t0 = time.perf_counter()
    out = kmeans_assign(vecs, k=16, n_iterations=2, init="hash_sample")
    stats = out.groupBy("cluster_id").count().agg(
        F.count("*").alias("k"), F.max("count").alias("biggest")
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"v7_kmeans_assign: {N_VECS:,} vecs × 2 iters in {dt:.1f}s — "
        f"{stats['k']} clusters, largest {stats['biggest']:,}",
        flush=True,
    )


def smoke_m2(spark):
    import io
    import struct
    import zlib

    import pandas as pd

    from fhir_etl_spark.operators.multimodal import decode_image

    def _png(seed: int, w=8, h=8) -> bytes:
        """Minimal valid RGB PNG, seed-varied pixels (no numpy needed)."""
        raw = b"".join(
            b"\x00"
            + bytes(((seed * 31 + y * 77 + x * 13 + c * 7) % 256)
                    for x in range(w) for c in range(3))
            for y in range(h)
        )
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf["id"], "media": [_png(int(i)) for i in pdf["id"]]}
            )

    path = "/tmp/scale_smoke_pngs.parquet"
    spark.range(N_IMAGES).repartition(64).mapInPandas(
        gen, "id long, media binary"
    ).write.mode("overwrite").parquet(path)

    imgs = spark.read.parquet(path)
    t0 = time.perf_counter()
    out = decode_image(imgs)
    stats = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("image.error").isNull(), 1).otherwise(0)).alias("ok"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"m2_image_decode: {stats['n']:,} PNGs decoded in {dt:.1f}s "
        f"({stats['ok']:,} ok, {stats['n'] - stats['ok']} errors) — "
        f"{stats['n'] / dt:,.0f} images/s",
        flush=True,
    )


def smoke_m6(spark):
    """JPEG codec tier at 100k images: formula 16×16 grayscale → encode
    (quality 33) → persist → decode_image; asserts every row decodes."""
    import pandas as pd

    from fhir_etl_spark.operators.multimodal import decode_image

    def gen(batches):
        import numpy as np

        from fhir_etl_spark.functions.jpeg import encode_jpeg

        for pdf in batches:
            blobs = []
            for i in pdf["id"]:
                yy, xx = np.mgrid[0:16, 0:16]
                img = ((int(i) * 31 + yy * 7 + xx * 13) % 256).astype("uint8")
                blobs.append(encode_jpeg(img, quality=33))
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    path = "/tmp/scale_smoke_jpegs.parquet"
    t0 = time.perf_counter()
    spark.range(N_IMAGES).repartition(64).mapInPandas(
        gen, "id long, media binary"
    ).write.mode("overwrite").parquet(path)
    enc_dt = time.perf_counter() - t0

    imgs = spark.read.parquet(path)
    t0 = time.perf_counter()
    out = decode_image(imgs)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("image.error").isNull(), 1).otherwise(0)).alias("ok"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["ok"] == stats["n"], f"{stats['n'] - stats['ok']} decode errors"
    print(
        f"m6_jpeg: {stats['n']:,} JPEGs encoded in {enc_dt:.1f}s "
        f"({stats['n'] / enc_dt:,.0f}/s), decoded in {dt:.1f}s "
        f"({stats['n'] / dt:,.0f}/s)",
        flush=True,
    )


def smoke_m7(spark):
    """MP4 demux tier at 100k files: 8-sample muxes → sample_video_frames
    (keyframes_only) → count; asserts zero error rows."""
    import pandas as pd

    from fhir_etl_spark.operators.multimodal import sample_video_frames

    def gen(batches):
        from fhir_etl_spark.functions.mp4 import mux_mp4

        for pdf in batches:
            blobs = []
            for i in pdf["id"]:
                samples = [
                    bytes([(int(i) + k) % 256] * (100 + k)) for k in range(8)
                ]
                blobs.append(
                    mux_mp4(samples, keyframe_indices=[0, 2, 4, 6], chunk_size=3)
                )
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    path = "/tmp/scale_smoke_mp4s.parquet"
    spark.range(N_IMAGES).repartition(64).mapInPandas(
        gen, "id long, media binary"
    ).write.mode("overwrite").parquet(path)

    vids = spark.read.parquet(path)
    t0 = time.perf_counter()
    frames = sample_video_frames(vids, keyframes_only=True)
    stats = frames.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("ok"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["ok"] == stats["n"], f"{stats['n'] - stats['ok']} demux errors"
    assert stats["n"] == N_IMAGES * 4, stats["n"]
    print(
        f"m7_mp4: {N_IMAGES:,} MP4s demuxed to {stats['n']:,} keyframes "
        f"in {dt:.1f}s ({N_IMAGES / dt:,.0f} files/s)",
        flush=True,
    )


def smoke_m8(spark):
    """WebM demux tier at 100k files: 9-frame muxes (3 per cluster) →
    sample_video_frames(keyframes_only) → count; asserts zero errors."""
    import pandas as pd

    from fhir_etl_spark.operators.multimodal import sample_video_frames

    def gen(batches):
        from fhir_etl_spark.functions.webm import mux_webm

        for pdf in batches:
            blobs = []
            for i in pdf["id"]:
                frames = [bytes([(int(i) + k) % 256] * (80 + k)) for k in range(9)]
                blobs.append(
                    mux_webm(frames, keyframe_indices=[0, 3, 6], frames_per_cluster=3)
                )
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    path = "/tmp/scale_smoke_webms.parquet"
    spark.range(N_IMAGES).repartition(64).mapInPandas(
        gen, "id long, media binary"
    ).write.mode("overwrite").parquet(path)

    vids = spark.read.parquet(path)
    t0 = time.perf_counter()
    frames = sample_video_frames(vids, keyframes_only=True)
    stats = frames.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("ok"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["ok"] == stats["n"], f"{stats['n'] - stats['ok']} demux errors"
    assert stats["n"] == N_IMAGES * 3, stats["n"]
    print(
        f"m8_webm: {N_IMAGES:,} WebMs demuxed to {stats['n']:,} keyframes "
        f"in {dt:.1f}s ({N_IMAGES / dt:,.0f} files/s)",
        flush=True,
    )


def smoke_m10(spark):
    """pHash near-dup at 100k images (50k planted pairs): hash via the
    PNG codec + DCT, 8-band Hamming LSH, exact verify; asserts the
    planted pairs are recovered exactly."""
    import pandas as pd

    from fhir_etl_spark.operators.multimodal import phash_image, phash_neardup_pairs

    def gen(batches):
        import numpy as np

        from fhir_etl_spark.functions.png import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                x = (np.uint64(int(i)) * np.uint64(0x9E3779B97F4A7C15)
                     + np.arange(1024, dtype=np.uint64)
                     * np.uint64(0xBF58476D1CE4E5B9))
                x ^= x >> np.uint64(30)
                x *= np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(27)
                base = (20 + (x % np.uint64(206))).astype("uint8").reshape(32, 32)
                for k, img in ((0, base), (1, base + 2)):
                    ids.append(2 * int(i) + k)
                    blobs.append(encode_png(img[:, :, None]))
            yield pd.DataFrame({"id": ids, "media": blobs})

    path = "/tmp/scale_smoke_phash.parquet"
    n_docs = N_IMAGES // 2
    spark.range(n_docs).repartition(64).mapInPandas(
        gen, "id long, media binary"
    ).write.mode("overwrite").parquet(path)

    imgs = spark.read.parquet(path)
    t0 = time.perf_counter()
    pairs = phash_neardup_pairs(phash_image(imgs), max_hamming=5)
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("b") == F.col("a") + 1) & (F.col("a") % 2 == 0), 1)
              .otherwise(0)).alias("planted"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["planted"] == n_docs, (stats["planted"], n_docs)
    print(
        f"m10_phash: {N_IMAGES:,} images hashed+paired in {dt:.1f}s "
        f"({N_IMAGES / dt:,.0f} imgs/s); {stats['n']:,} pairs "
        f"({stats['planted']:,} planted recovered, "
        f"{stats['n'] - stats['planted']:,} chance extras)",
        flush=True,
    )


def smoke_s12(spark):
    """WARC ingestion at 1M records: 64 member-gzip WARC files written
    distributed, then streamed back through the warc_archive DataSource
    (one partition per file); asserts every record round-trips."""
    import pandas as pd

    from fhir_etl_spark.sources.warc import WarcDataSource

    n_records, n_files = 1_000_000, 64
    out_dir = "/tmp/scale_smoke_warc"
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf):
        from fhir_etl_spark.sources.warc import http_response_record, write_warc

        fid = int(key[0])
        records = [
            http_response_record(
                f"http://c.local/{int(i)}",
                (b"doc-%d " % int(i)) * 20,  # ~140 B body
                record_id=f"r{int(i)}",
            )
            for i in sorted(pdf["id"])
        ]
        path = f"{out_dir}/part-{fid:04d}.warc.gz"
        with open(path, "wb") as f:
            f.write(write_warc(records))
        return pd.DataFrame({"fid": [fid], "n": [len(records)]})

    (
        spark.range(n_records)
        .withColumn("fid", F.col("id") % n_files)
        .groupBy("fid")
        .applyInPandas(write_group, "fid long, n long")
        .collect()
    )

    try:
        spark.dataSource.register(WarcDataSource)
    except Exception:
        pass
    paths = ",".join(f"{out_dir}/part-{fid:04d}.warc.gz" for fid in range(n_files))
    t0 = time.perf_counter()
    df = spark.read.format("warc_archive").option("paths", paths).load()
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error").isNull() & (F.col("http_status") == 200), 1)
              .otherwise(0)).alias("ok"),
        F.sum(F.length("payload")).alias("body_bytes"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["n"] == n_records and stats["ok"] == n_records, stats
    print(
        f"s12_warc: {n_records:,} records / {n_files} gzip-member WARC files "
        f"demuxed in {dt:.1f}s ({n_records / dt:,.0f} rec/s, "
        f"{stats['body_bytes'] / dt / 1e6:,.0f} MB/s body)",
        flush=True,
    )


SMOKES = {"d10": smoke_d10, "t12": smoke_t12, "v5": smoke_v5, "v7": smoke_v7,
          "m2": smoke_m2, "m6": smoke_m6, "m7": smoke_m7, "m8": smoke_m8,
          "m10": smoke_m10, "s12": smoke_s12}


def main() -> None:
    names = sys.argv[1:] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        SMOKES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
