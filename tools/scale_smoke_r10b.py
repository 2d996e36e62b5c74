"""Round-10 second scale smoke: the session's new operators at
production shape on local[32]. Inputs synthesized with pure Spark
expressions; each smoke plants the shape that would kill a naive
formulation.

- t26 line dedup: 1M multi-line pages where EVERY page shares 3
  boilerplate lines (header/footer/source tags) — the planted killer is
  the boilerplate digest group: ~1M-doc doc-frequency counts must
  partial-aggregate map-side, and the anti join must not fan out.
- m16 PDF extraction: 200k typeset multi-page PDFs through
  encode→extract — codec tier, map-only; throughput should track the
  Arrow batch scan.
- ds12 cluster cap: 150k vectors (dim 64) k-means + cap — the window
  must WindowGroupLimit (map-side pre-prune), never a full sort.

Usage: python tools/scale_smoke_r10b.py [smoke ...]
  smokes: t26 m16 ds12 v14   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from scale_smoke_r10 import make_spark, synth_docs


def smoke_t26(spark) -> None:
    from fhir_etl_spark.operators.dedup import line_dedup

    n = 1_000_000
    docs = synth_docs(spark, n, tokens_per_doc=36)
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("please accept cookies to continue reading this page"),
            F.concat(F.lit("source: src"), (F.col("doc_id") % 20).cast("string")),
            # 3 content lines of 12 tokens — unique per doc by xxhash
            F.col("text"),
            F.lit("copyright 2020 corpus local all rights reserved"),
        ).alias("text"),
    )
    t0 = time.time()
    out = line_dedup(pages, min_doc_freq=30)
    kept = out.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_kept").alias("kept_lines"),
        F.sum("n_lines").alias("total_lines"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"t26: {n} pages in {dt:.1f}s ({n / dt / 1e3:.1f}k pages/s); "
        f"docs={kept['docs']} lines {kept['total_lines']} -> {kept['kept_lines']} "
        f"(boilerplate stripped: {kept['total_lines'] - kept['kept_lines']})"
    )
    assert kept["docs"] == n
    # header/footer/source lines all exceed min_doc_freq -> exactly the
    # 1 content line per doc survives (synth text is one line)
    assert kept["kept_lines"] == n, kept


def smoke_m16(spark) -> None:
    from fhir_etl_spark.operators.multimodal import pdf_text
    from fhir_etl_spark.queries.multimodal import _M16_LPP, _M16_TPL, _m16_header

    import pandas as pd  # noqa: F401 (worker-side)

    n = 200_000
    docs = synth_docs(spark, n, tokens_per_doc=40)

    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_fields = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fhir_etl_spark.functions.pdf import encode_pdf

        for pdf in it:
            blobs = []
            for text in pdf["text"]:
                toks = text.split(" ")
                lines = [
                    " ".join(toks[i : i + _M16_TPL])
                    for i in range(0, len(toks), _M16_TPL)
                ]
                pages = [
                    [_m16_header(p)] + lines[p * _M16_LPP : (p + 1) * _M16_LPP]
                    for p in range((len(lines) + _M16_LPP - 1) // _M16_LPP)
                ]
                blobs.append(encode_pdf(pages))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    media = docs.mapInPandas(build, out_fields)
    t0 = time.time()
    res = (
        pdf_text(media)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("doc.n_pages")).alias("pages"),
            F.sum(F.when(F.col("doc.error").isNotNull(), 1).otherwise(0)).alias("errs"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    print(
        f"m16: {n} PDFs ({res['pages']} pages) encode+extract in {dt:.1f}s "
        f"({n / dt / 1e3:.1f}k docs/s); errors={res['errs']}"
    )
    assert res["docs"] == n and res["errs"] == 0


def smoke_ds12(spark) -> None:
    from fhir_etl_spark.operators.datasets import cluster_cap_sample
    from fhir_etl_spark.operators.similarity import kmeans_assign

    n, dim = 150_000, 64
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64("id", i), F.lit(1000)) / 500.0 - 1.0),
        ).alias("embedding"),
    )
    quality = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("quality"),
    )
    t0 = time.time()
    clusters = kmeans_assign(vecs, k=64, n_iterations=2, dim=dim, train_rows=40_000)
    out = cluster_cap_sample(clusters, quality, per_cluster=500)
    cnt = out.count()
    dt = time.time() - t0
    print(f"ds12: {n} vecs -> k=64 assign + cap500 = {cnt} kept in {dt:.1f}s")
    assert 0 < cnt <= 64 * 500


def smoke_v14(spark) -> None:
    from fhir_etl_spark.operators.similarity import (
        hashed_embedding,
        hashed_embedding_topk,
    )
    from fhir_etl_spark.queries.similarity import _V14_Q

    n = 200_000
    docs = synth_docs(spark, n, tokens_per_doc=40)
    t0 = time.time()
    emb = hashed_embedding(docs)
    top = hashed_embedding_topk(emb, _V14_Q, k=10).collect()
    dt = time.time() - t0
    print(
        f"v14: {n} docs embed(dim=64)+topk in {dt:.1f}s "
        f"({n / dt / 1e3:.1f}k docs/s); top={len(top)}"
    )
    assert len(top) == 10


SMOKES = {
    "t26": smoke_t26,
    "m16": smoke_m16,
    "ds12": smoke_ds12,
    "v14": smoke_v14,
}


def main() -> None:
    names = sys.argv[1:] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        SMOKES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
