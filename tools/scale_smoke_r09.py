"""Round-9 scale smoke: the new operators at 1M-document scale on
local[32]. Inputs are synthesized with pure Spark expressions; each
smoke plants the shape that would kill a naive formulation.

- t22 classifier: 1M docs through the frozen-weights codegen fold —
  map-only, so throughput should track the token scan.
- t23 BM25: build the inverted index over 1M docs, then score a
  3-query batch — the postings side must NOT shuffle per query
  (broadcast-terms plan), and the index build is the only corpus cost.
- d13 suffix array: 200k docs (~6M suffixes) through the full
  prefix-doubling + LCP-walk build, with a planted duplicated passage
  — checks the log-round build survives real fan-in and that removal
  lands exactly on the planted spans.

Usage: python tools/scale_smoke_r09.py [smoke ...]
  smokes: t22 t23 d13   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = 64


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r09")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def synth_docs(spark, n_docs: int, tokens_per_doc: int = 40):
    """Deterministic synthetic corpus: per-doc token streams drawn from
    a 64-word vocabulary via xxhash64 — no RNG, reproducible."""
    words = F.array(*[F.lit(f"w{i}") for i in range(VOCAB)])
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(tokens_per_doc)),
                lambda i: F.element_at(
                    words,
                    (F.pmod(F.xxhash64("id", i), F.lit(VOCAB)) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )


def smoke_t22(spark):
    from fhir_etl_spark.functions import ft_weights as fw
    from fhir_etl_spark.operators.classifier import linear_classifier_scores

    n = 1_000_000
    docs = synth_docs(spark, n).localCheckpoint()
    t0 = time.perf_counter()
    out = linear_classifier_scores(docs, fw.W_MICRO, fw.BIAS_MICRO, salt=fw.SALT)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("label") == "en", 1).otherwise(0)).alias("pos"),
        F.min("score_micro").alias("lo"),
        F.max("score_micro").alias("hi"),
    ).first()
    dt = time.perf_counter() - t0
    assert agg["n"] == n
    print(
        f"t22: {n} docs scored in {dt:.1f}s ({n/dt/1000:.0f}k docs/s), "
        f"pos={agg['pos']} score range [{agg['lo']}, {agg['hi']}]"
    )


def smoke_t23(spark):
    from fhir_etl_spark.operators.retrieval import bm25_index, bm25_topk

    n = 1_000_000
    docs = synth_docs(spark, n).localCheckpoint()
    t0 = time.perf_counter()
    postings, dfreq, stats = bm25_index(docs)
    # materialize ALL THREE index tables once (what the deployment
    # write persists — the first cut checkpointed only postings and the
    # query leg silently re-ran two full corpus scans through the
    # dfreq/stats lineage)
    postings = postings.localCheckpoint()
    dfreq = dfreq.localCheckpoint()
    stats = stats.localCheckpoint()
    n_post = postings.count()
    t_build = time.perf_counter() - t0
    q = spark.createDataFrame(
        [(1, "w1 w2 w3"), (2, "w10 w20"), (3, "w63")],
        "query_id int, query string",
    )
    t0 = time.perf_counter()
    top = bm25_topk(postings, dfreq, stats, q, k=10).collect()
    t_query = time.perf_counter() - t0
    assert len(top) == 30 and len({r["query_id"] for r in top}) == 3
    print(
        f"t23: index {n_post} postings over {n} docs in {t_build:.1f}s; "
        f"3-query top-10 scored in {t_query:.1f}s"
    )


def smoke_d13(spark):
    from fhir_etl_spark.operators.dedup import suffix_array_dedup

    n = 200_000
    boiler = " ".join(f"b{i}" for i in range(12))  # 12 planted tokens
    docs = synth_docs(spark, n, tokens_per_doc=30).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" " + boiler))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    out = suffix_array_dedup(docs, min_len=8).localCheckpoint()
    dt = time.perf_counter() - t0
    planted = out.filter(F.col("doc_id") % 10 == 0)
    stats = planted.agg(
        F.count("*").alias("n"), F.min("n_removed").alias("lo")
    ).first()
    assert stats["n"] == n // 10
    # every planted doc must lose AT LEAST the 12-token boilerplate —
    # and no planted doc may lose everything (42): full-doc removal was
    # the symptom of the round-9 distributed_dense_rank re-execution
    # bug this smoke caught
    assert 12 <= stats["lo"] < 42, stats
    total = out.count()
    assert total == n
    print(
        f"d13: suffix-array build+removal over {n} docs "
        f"(~{n*30/1e6:.0f}M suffixes) in {dt:.1f}s; every planted doc "
        f"lost >= {stats['lo']} tokens"
    )


SMOKES = {"t22": smoke_t22, "t23": smoke_t23, "d13": smoke_d13}


def main() -> None:
    picks = [a for a in sys.argv[1:] if not a.startswith("-")] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in picks:
        SMOKES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
