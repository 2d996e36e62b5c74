"""Round-8 scale smoke: the SemDeDup oversized-cluster RE-SPLIT, the
Gopher char-repetition rules, and int8-quantized ANN at 100k-1M row
scale on local[32], one timing line per operator. Inputs are synthesized
with pure Spark expressions (no driver-side data); each smoke plants the
degenerate shape that kills a naive formulation.

Usage: python tools/scale_smoke_r08.py [smoke ...]
  smokes: resplit t17 v9   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r08")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def smoke_resplit(spark):
    """The r07 smoke's exact planted shape (100k vectors, 90k over 1000
    base directions, 10k NEAR-IDENTICAL — an over-cap degenerate
    cluster), re-asserted under round 8's re-split semantics: the
    degenerate block must now be DEDUPED (old behavior kept its over-cap
    tail un-deduped), collapsing to at most a few dozen keepers
    (sub-clusters + rank-chunk blocks), with no member missing from the
    output."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    n, dim, n_base = 100_000, 64, 1000
    dims = F.array(*[F.lit(d) for d in range(dim)])
    base = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.col("bid"), d, F.lit(7)), F.lit(2001)) - 1000
        ) / 1000.0,
    )
    noise = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.col("id"), d, F.lit(11)), F.lit(2001)) - 1000
        ) / 1000.0 * 0.03,
    )
    vecs = (
        spark.range(n)
        .withColumn(
            "bid",
            F.when(F.col("id") >= 90_000, F.lit(0)).otherwise(
                F.col("id") % n_base
            ),
        )
        .select(
            F.col("id").alias("vec_id"),
            F.zip_with(base, noise, lambda b, z: b + z).alias("embedding"),
        )
    )
    t0 = time.perf_counter()
    out = semdedup_keep(
        vecs, k=100, n_iterations=2, threshold=0.97,
        max_cluster_size=2000, init="hash_sample",
    ).localCheckpoint()
    stats = out.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).collect()[0]
    block = out.filter(F.col("vec_id") >= 90_000).agg(
        F.count("*").alias("rows"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    assert stats["rows"] == n, stats
    assert block["rows"] == 10_000, block  # nobody disappears
    # the old truncation policy kept the ~8k over-cap members un-deduped;
    # the re-split must collapse the block to sub-cluster/chunk keepers
    assert block["kept"] <= 100, block
    assert stats["kept"] < n * 0.10, stats
    print(
        f"resplit semdedup: {n} vecs -> kept {stats['kept']} total "
        f"({100 * stats['kept'] / n:.1f}%), degenerate 10k block kept "
        f"{block['kept']} in {dt:.1f}s"
    )


def smoke_t17(spark):
    """200k synthesized docs (~48 tokens each from a 200-word hash
    vocabulary) + two planted pathologies: doc 0 is one 5-gram repeated
    10 times (dup-coverage 1.0 -> reject) and doc 1 is one bigram
    repeated 24 times (top-2-gram fraction ~1.0 -> reject). The gram
    groupBys are doc-local keys — the smoke proves the 12M-5-gram
    shuffle holds and the planted flags fire at scale."""
    from fhir_etl_spark.operators.text import gopher_char_repetition

    n, toks_per_doc = 200_000, 48
    idx = F.sequence(F.lit(0), F.lit(toks_per_doc - 1))
    body = F.array_join(
        F.transform(
            idx,
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(3)), F.lit(200)).cast(
                    "string"
                ),
            ),
        ),
        " ",
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit(" ".join(["p q r s t"] * 10)))
        .when(F.col("id") == 1, F.lit(" ".join(["ab cd"] * 24)))
        .otherwise(body)
        .alias("text"),
    )
    t0 = time.perf_counter()
    out = gopher_char_repetition(docs).localCheckpoint()
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("dup_gram_reject").cast("long")).alias("dup_rej"),
        F.sum(F.col("top_gram_reject").cast("long")).alias("top_rej"),
    ).collect()[0]
    planted = {r["doc_id"]: r for r in out.filter(F.col("doc_id") < 2).collect()}
    dt = time.perf_counter() - t0
    assert agg["rows"] == n, agg
    assert planted[0]["dup_gram_reject"], planted[0]
    assert planted[0]["dup_covered_chars"] == planted[0]["word_chars"]
    assert planted[1]["top_gram_reject"], planted[1]
    print(
        f"t17 gopher: {n} docs ({n * (toks_per_doc - 4)} 5-grams) -> "
        f"{agg['dup_rej']} dup-rejects / {agg['top_rej']} top-rejects "
        f"in {dt:.1f}s"
    )


def smoke_v9(spark):
    """1M 64-dim vectors, int8-quantized with one global absmax, 3 probe
    queries: the brute-force integer-dot top-5 must self-match each
    probe at rank 1 and finish in seconds — the map-only 4x-narrower
    scan is the point."""
    from fhir_etl_spark.operators.similarity import int8_topk

    n, dim = 1_000_000, 64
    dims = F.array(*[F.lit(d) for d in range(dim)])
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            dims,
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d, F.lit(5)), F.lit(2001)) - 1000
            ) / 1000.0,
        ).alias("embedding"),
    ).localCheckpoint()  # materialize once: corpus scan + absmax + search
    queries = vecs.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.perf_counter()
    got = int8_topk(vecs, queries, k=5, dim=dim).collect()
    dt = time.perf_counter() - t0
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(by_query) == {1, 2, 3}
    for qid, ids in by_query.items():
        assert ids[0] == qid, (qid, ids)  # self-match survives quantization
    print(f"v9 int8 ann: {n} x {dim} dims, 3 probes top-5 in {dt:.1f}s")


SMOKES = {"resplit": smoke_resplit, "t17": smoke_t17, "v9": smoke_v9}


def main():
    names = [a for a in sys.argv[1:] if a in SMOKES] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        SMOKES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
