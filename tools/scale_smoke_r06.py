"""Round-6 scale smoke: the new graph / quality / Bloom / URL operators
at 1M–10M row scale on local[32], one timing line per operator. Inputs
are synthesized with pure Spark expressions (no driver-side data).

Usage: python tools/scale_smoke_r06.py [smoke ...]
  smokes: g3 g4 d11 t16 dq1 j11 r4 m12   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r06")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def smoke_g3(spark):
    """2M-edge graph over 100k nodes with a 50k-degree hub: the exact
    shape naive wedge enumeration dies on (the hub alone would emit
    ~1.25e9 wedges); degree orientation must keep it flat."""
    from fhir_etl_spark.operators.graph import triangle_counts

    n_nodes, n_rand, n_hub = 100_000, 2_000_000, 50_000
    rand = spark.range(n_rand).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)).alias("dst"),
    )
    hub = spark.range(1, n_hub + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    edges = rand.unionByName(hub)
    t0 = time.perf_counter()
    stats = triangle_counts(edges).agg(
        F.count("*").alias("nodes"), F.sum("n_triangles").alias("corner_sum")
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"g3_triangle_counts: {n_rand + n_hub:,} edges ({n_hub:,}-degree hub) "
        f"in {dt:.1f}s — {stats['nodes']:,} nodes in triangles, "
        f"{stats['corner_sum'] // 3:,} triangles",
        flush=True,
    )


def smoke_g4(spark):
    """BFS over a 1M-node graph: a 40-deep chain of 25k-node layers
    (each node → 2 nodes of the next layer) from a 100-seed frontier —
    pins per-round frontier discipline and the empty-frontier stop."""
    from fhir_etl_spark.operators.graph import bfs_hops

    layer, depth = 25_000, 40
    ids = spark.range(layer * depth)
    e1 = ids.where(F.col("id") < layer * (depth - 1)).select(
        F.col("id").alias("src"), (F.col("id") + layer).alias("dst")
    )
    e2 = ids.where(F.col("id") < layer * (depth - 1)).select(
        F.col("id").alias("src"),
        (F.pmod(F.xxhash64("id"), F.lit(layer))
         + (F.col("id") / layer + 1).cast("long") * layer).alias("dst"),
    )
    sources = spark.range(100).select(F.col("id").alias("node"))
    t0 = time.perf_counter()
    out = bfs_hops(e1.unionByName(e2), sources, max_hops=12)
    stats = out.agg(
        F.count("*").alias("n"), F.max("dist").alias("maxd")
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"g4_bfs_hops: {layer * depth:,} nodes / {2 * layer * (depth - 1):,} "
        f"edges, 12 hops in {dt:.1f}s — {stats['n']:,} reached, "
        f"max dist {stats['maxd']}",
        flush=True,
    )


def smoke_d11(spark):
    """1M-doc corpus vs a 10k-doc benchmark: Bloom-prefiltered
    decontamination must match the exact path row-for-row while the
    broadcast payload is the fixed 512 KiB bitset."""
    from fhir_etl_spark.operators.contamination import (
        bloom_contamination_hits,
        contamination_hits,
    )

    n_docs = 1_000_000
    vocab = F.array(*[F.lit(f"w{i}") for i in range(5000)])
    # every 200th corpus doc reuses a benchmark doc's word stream
    base = F.when(F.col("id") % 200 == 0, F.col("id") % 10_000).otherwise(
        F.col("id") + 1_000_000
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(base, i), 5000) + 1).cast("int")
            ),
        ),
    )
    corpus = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
    bench_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("id"), i), 5000) + 1).cast("int")
            ),
        ),
    )
    bench = spark.range(10_000).select(F.col("id").alias("doc_id"), bench_text.alias("text"))

    t0 = time.perf_counter()
    n_bloom = bloom_contamination_hits(corpus, bench, k=5).count()
    dt_bloom = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_exact = contamination_hits(corpus, bench, k=5).count()
    dt_exact = time.perf_counter() - t0
    assert n_bloom == n_exact, (n_bloom, n_exact)
    print(
        f"d11_bloom_decontaminate: {n_docs:,} docs vs 10k bench — bloom "
        f"{dt_bloom:.1f}s, exact {dt_exact:.1f}s, {n_bloom:,} contaminated "
        f"(paths agree)",
        flush=True,
    )


def smoke_t16(spark):
    """10M synthesized URLs through the full parse/canonicalize
    projection — pure codegen, should run at scan speed."""
    from fhir_etl_spark.operators.urls import url_components

    n = 10_000_000
    url = F.concat(
        F.lit("https://sub"), (F.col("id") % 1000).cast("string"),
        F.lit(".Site"), (F.col("id") % 5000).cast("string"),
        F.lit(".co.uk/p"), (F.col("id") % 97).cast("string"),
        F.lit("/x?utm_source=a&b="), (F.col("id") % 7).cast("string"),
        F.lit("&a=1#f"),
    )
    df = spark.range(n).select(F.col("id").alias("doc_id"), url.alias("url"))
    t0 = time.perf_counter()
    stats = url_components(df).agg(
        F.count("*").alias("n"),
        F.count_distinct("reg_domain").alias("domains"),
        F.count_distinct("norm_url").alias("urls"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"t16_url_components: {n:,} URLs in {dt:.1f}s "
        f"({n / dt / 1e6:.1f}M rows/s) — {stats['domains']:,} reg domains, "
        f"{stats['urls']:,} canonical urls",
        flush=True,
    )


def smoke_dq1(spark):
    """10M-row constraint suite: 7 checks, one aggregation pass."""
    from fhir_etl_spark.operators import quality as Q

    n = 10_000_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), 100) / 10.0).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("s"),
    )
    t0 = time.perf_counter()
    out = Q.check_constraints(
        df,
        [
            ("rows", Q.row_count(), float(n), float(n)),
            ("k_complete", Q.completeness("k"), 1.0, 1.0),
            ("k_unique", Q.uniqueness("k"), 0.99, 1.0),
            ("v_min", Q.col_min("v"), 0.0, None),
            ("v_max", Q.col_max("v"), None, 10.0),
            ("s_domain", Q.in_set_fraction("s", ["u0", "u1", "u2"]), 1.0, 1.0),
            ("s_pattern", Q.matches_fraction("s", "^u[0-9]$"), 1.0, 1.0),
        ],
    ).collect()
    dt = time.perf_counter() - t0
    n_pass = sum(1 for r in out if r["status"] == "pass")
    print(
        f"dq1_check_constraints: {n:,} rows × 7 checks in {dt:.1f}s — "
        f"{n_pass}/7 pass",
        flush=True,
    )


def smoke_j11(spark):
    """1M-name roster vs 100k corrupted names at Levenshtein <= 1:
    deletion-variant blocking must keep candidate generation linear
    (~20 variants/name) where the quadratic compare is 1e11 pairs."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.linkage import fuzzy_match_pairs

    n = 1_000_000
    name = F.concat(F.lit("person_"), F.lpad((F.col("id")).cast("string"), 9, "0"))
    roster = spark.range(n).select(F.col("id").alias("a_id"), name.alias("a_text"))
    pos = (F.col("id") % 8 + 9).cast("int")
    corrupted = spark.range(0, n, 10).select(
        F.col("id").alias("b_id"),
        F.concat(
            F.substring(name, F.lit(1), pos - 1), F.lit("X"),
            F.substring(name, pos + 1, F.length(name)),
        ).alias("b_text"),
    )
    t0 = time.perf_counter()
    cnt = fuzzy_match_pairs(roster, corrupted, max_distance=1).count()
    dt = time.perf_counter() - t0
    print(
        f"j11_fuzzy_match: {n:,} roster x {n // 10:,} corrupted in {dt:.1f}s "
        f"- {cnt:,} pairs at distance <= 1",
        flush=True,
    )


def smoke_r4(spark):
    """5M x 500k interval-overlap join keyed by 10k groups: the
    canonical-bucket formulation must stay linear in candidates (the
    theta join would be 2.5e12 comparisons)."""
    from fhir_etl_spark.operators.joins import interval_overlap_join

    nl, nr, groups = 5_000_000, 500_000, 10_000
    left = spark.range(nl).select(
        F.col("id").alias("a_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(groups)).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 100_000) * 1.0).alias("s1"),
    ).withColumn("e1", F.col("s1") + 50.0)
    right = spark.range(nr).select(
        F.col("id").alias("b_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(groups)).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(4)), 100_000) * 1.0).alias("s2"),
    ).withColumn("e2", F.col("s2") + 30.0)
    t0 = time.perf_counter()
    n = interval_overlap_join(
        left, right, "s1", "e1", "s2", "e2", bucket_width=64.0, extra_on="g"
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"r4_interval_overlap: {nl:,} x {nr:,} intervals / {groups:,} groups "
        f"in {dt:.1f}s - {n:,} overlapping pairs",
        flush=True,
    )


def smoke_m12(spark):
    """50k GIFs (32x24, 16 colors) through the pure-python LZW decoder."""
    from fhir_etl_spark.operators.multimodal import decode_image

    def gen(batches):
        import numpy as np
        import pandas as pd

        from fhir_etl_spark.functions.gif import encode_gif

        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        for pdf in batches:
            blobs = []
            for i in pdf["id"]:
                yy, xx = np.mgrid[0:24, 0:32]
                idx = ((int(i) + yy * 3 + xx) % 16).astype(np.uint8)
                blobs.append(encode_gif([idx], pal))
            yield pd.DataFrame({"id": pdf["id"], "media": blobs})

    n = 50_000
    imgs = spark.range(n).repartition(64).mapInPandas(gen, "id long, media binary")
    t0 = time.perf_counter()
    stats = decode_image(imgs).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("image.error").isNull(), 1).otherwise(0)).alias("ok"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"m12_gif_decode: {n:,} GIFs decoded in {dt:.1f}s "
        f"({n / dt:.0f} imgs/s incl. generation), {stats['ok']:,} ok",
        flush=True,
    )


SMOKES = {"g3": smoke_g3, "g4": smoke_g4, "d11": smoke_d11,
          "t16": smoke_t16, "dq1": smoke_dq1, "j11": smoke_j11,
          "r4": smoke_r4, "m12": smoke_m12}

if __name__ == "__main__":
    picks = sys.argv[1:] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for p in picks:
        SMOKES[p](spark)
