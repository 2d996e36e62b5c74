"""Round-8b scale smoke: the continuation-session operators at 1M-10M row
scale on local[32] — EWMA fold, label-propagation communities, DSIR
importance scoring, and the histogram quantile-bucket split. Inputs are
synthesized with pure Spark expressions; each smoke plants the shape that
would kill a naive formulation (hub skew for LPA, vocabulary separation
for DSIR, a quantized-score histogram far smaller than the corpus for the
bucket split).

Usage: python tools/scale_smoke_r08b.py [smoke ...]
  smokes: ewma lpa dsir buckets   (default: all)
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
        .appName("scale_smoke_r08b")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def smoke_ewma(spark):
    """10M events over 100k users (100/user): one groupBy shuffle, then
    the per-key fold runs entirely in executor memory. Spot-check one
    user's trajectory against a local Python fold — same IEEE ops, so
    equality is exact."""
    from fhir_etl_spark.operators.timeseries import ewma

    n, users = 10_000_000, 100_000
    events = spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        (F.col("id") / users).cast("long").alias("t"),
        (
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(2001)) - 1000) / 100.0
        ).alias("value"),
    )
    t0 = time.perf_counter()
    out = ewma(events, ["user_id"], ["t"], "value", alpha=0.25)
    total = out.count()
    got = [
        (r["t"], r["value"], r["ewma"])
        for r in sorted(
            out.filter(F.col("user_id") == 7).collect(), key=lambda r: r["t"]
        )
    ]
    dt = time.perf_counter() - t0
    assert total == n, total
    s = None
    for _, v, e in got:
        s = v if s is None else 0.25 * v + 0.75 * s
        assert e == s, (e, s)
    print(f"ewma: {n} events / {users} users folded in {dt:.1f}s")


def smoke_lpa(spark):
    """1M nodes in 100k 10-cliques plus a 50k-degree hub (the vote-count
    skew shape): 3 synchronous rounds over ~9.1M directed edges. Every
    clique must converge to ONE community and the hub's 50k-vote argmax
    must resolve through partial aggregation, not a single hot reducer."""
    from fhir_etl_spark.operators.graph import label_propagation

    n, per = 1_000_000, 10
    hub = n  # extra node wired to the first 50k nodes
    members = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") / per).cast("long") * per).alias("base"),
    )
    clique_edges = members.select(
        "src",
        F.explode(
            F.filter(
                F.transform(F.sequence(F.lit(0), F.lit(per - 1)), lambda j: F.col("base") + j),
                lambda d: d != F.col("src"),
            )
        ).alias("dst"),
    )
    hub_nodes = spark.range(50_000)
    hub_edges = hub_nodes.select(
        F.lit(hub).alias("src"), F.col("id").alias("dst")
    ).unionByName(hub_nodes.select(F.col("id").alias("src"), F.lit(hub).alias("dst")))
    edges = clique_edges.unionByName(hub_edges)

    t0 = time.perf_counter()
    labels = label_propagation(edges, n_iterations=3)
    per_clique = (
        labels.filter(F.col("node") < n)
        .groupBy((F.col("node") / per).cast("long").alias("clique"))
        .agg(F.countDistinct("community").alias("k"))
        .agg(F.max("k").alias("max_k"), F.count(F.lit(1)).alias("n_cliques"))
        .first()
    )
    dt = time.perf_counter() - t0
    assert per_clique["max_k"] == 1, per_clique
    assert per_clique["n_cliques"] == n // per
    print(
        f"lpa: {n + 1} nodes / ~9.1M edges (50k-degree hub) -> "
        f"{per_clique['n_cliques']} uniform cliques in {dt:.1f}s"
    )


def smoke_dsir(spark):
    """1M docs, 10% target (en) with a partially separated vocabulary:
    the token explode is ~31M rows into a 256-key partial agg; scoring is
    a broadcast join + per-doc sum. Pure-target-vocab docs must outscore
    pure-raw-vocab docs."""
    from fhir_etl_spark.operators.datasets import dsir_importance

    n, toks = 1_000_000, 31
    # doc i is 'en' when i%10==0; en docs draw from tokens e0..e99,
    # others from d0..d199 (disjoint pools)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "en").otherwise("de").alias("lang"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(toks)),
                lambda j: F.concat(
                    F.when(F.col("id") % 10 == 0, F.lit("e")).otherwise(F.lit("d")),
                    F.pmod(
                        F.xxhash64(F.col("id"), j, F.lit(13)),
                        F.when(F.col("id") % 10 == 0, F.lit(100)).otherwise(F.lit(200)),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    scores = dsir_importance(docs, target=F.col("lang") == "en")
    stats = (
        scores.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("score_micro").alias("avg"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    dt = time.perf_counter() - t0
    by = {r["lang"]: r for r in stats}
    assert by["en"]["c"] == n // 10 and by["de"]["c"] == n - n // 10
    assert by["en"]["avg"] > 0 > by["de"]["avg"], by
    print(
        f"dsir: {n} docs (~{n * toks // 10 ** 6}M tokens) scored in {dt:.1f}s "
        f"(en avg {by['en']['avg']:.0f} vs de {by['de']['avg']:.0f} micro-logs)"
    )


def smoke_buckets(spark):
    """10M rows, scores quantized to 2dp in [0, 100) (10k distinct values
    — the histogram the quantile scan actually sorts): tercile cuts from
    the histogram, labels applied map-side; each bucket within 1% of
    n/3."""
    from fhir_etl_spark.operators.text import quantile_buckets

    n = 10_000_000
    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        (F.pmod(F.xxhash64("id", F.lit(17)), F.lit(10_000)) / 100.0).alias("s"),
    )
    t0 = time.perf_counter()
    counts = {
        r["bucket"]: r["c"]
        for r in quantile_buckets(df, "s")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    dt = time.perf_counter() - t0
    assert set(counts) == {"head", "middle", "tail"}
    for name, c in counts.items():
        assert abs(c - n / 3) < n * 0.01, (name, c)
    print(f"buckets: {n} rows -> terciles {counts} in {dt:.1f}s")


SMOKES = {
    "ewma": smoke_ewma,
    "lpa": smoke_lpa,
    "dsir": smoke_dsir,
    "buckets": smoke_buckets,
}


def main():
    names = [a for a in sys.argv[1:] if a in SMOKES] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        SMOKES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
