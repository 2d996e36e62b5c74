"""Round-12 second-session operators: x17 KMV set relations, v17
binary→cosine cascade, ds14 length-bucketed batching. Semantic pins the
sf0.01 value oracles can't express (planted structure, edge cases)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _sketch(spark, rows, k=128):
    """Build a KMV sketch table from (source, text) rows the same way
    x17 does."""
    from fhir_etl_spark.operators.sketch import kmv_sample_sketch

    df = spark.createDataFrame(rows, "source string, text string").select(
        "source", F.md5("text").alias("dg"), F.lit(0.0).alias("_zero")
    )
    return kmv_sample_sketch(
        df, group_cols=["source"], value_col="_zero", row_key_cols=["dg"], k=k
    )


def test_kmv_set_relations_identical_and_disjoint(spark):
    from fhir_etl_spark.operators.sketch import kmv_set_relations

    shared = [("a", f"doc {i}") for i in range(40)]
    rows = shared + [("b", t) for _, t in shared] + [
        ("c", f"other {i}") for i in range(40)
    ]
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_set_relations(_sketch(spark, rows), "source").collect()
    }
    # a and b hold the same 40 texts; sketches are unsaturated → exact
    ab = out[("a", "b")]
    assert ab["jaccard_est"] == 1.0
    assert ab["union_est"] == 40.0 and ab["inter_est"] == 40.0
    # c is disjoint from both
    assert out[("a", "c")]["jaccard_est"] == 0.0
    assert out[("a", "c")]["inter_est"] == 0.0
    assert out[("a", "c")]["union_est"] == 80.0


def test_kmv_set_relations_saturated_estimates(spark):
    """Past k the estimators go approximate — bound the relative error
    to the ~1/sqrt(k) band instead of pinning exact values."""
    from fhir_etl_spark.operators.sketch import kmv_set_relations

    k = 64
    # 600 distinct texts; a holds [0, 400), b holds [200, 600):
    # |A∪B| = 600, |A∩B| = 200, J = 1/3
    rows = [("a", f"t {i}") for i in range(400)] + [
        ("b", f"t {i}") for i in range(200, 600)
    ]
    r = kmv_set_relations(_sketch(spark, rows, k=k), "source").collect()[0]
    assert abs(r["union_est"] - 600) / 600 < 0.5
    assert abs(r["jaccard_est"] - 1 / 3) < 0.25


def test_cascade_matches_exact_topk_on_separated_corpus(spark):
    """When the binary prefilter keeps enough candidates, the cascade's
    top-k equals brute-force cosine top-k (recall 1.0 on a corpus whose
    neighbors differ in sign structure)."""
    import random

    from fhir_etl_spark.operators.similarity import (
        cascade_hamming_cosine,
        cosine_topk,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(corpus, queries, k=3, dim=64).collect()
    }
    casc = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cascade_hamming_cosine(
            corpus, queries, k=3, candidates=100, dim=64
        ).collect()
    }
    # rank 1 is the query itself (cosine 1.0) — the cascade must agree
    # everywhere when candidates cover half the corpus
    assert casc == exact


def test_ds14_padding_arithmetic(spark):
    """Hand-sized corpus: one bucket, one shard, batch max padding."""
    from fhir_etl_spark.queries.registry import get_query

    import tempfile, os

    # doc_ids ≡ 0 mod 16 land in one shard; lengths 20 and 30 → bucket 16
    rows = [(0, " ".join(["w"] * 20), "s"), (16, " ".join(["w"] * 30), "s")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = get_query("ds14_length_bucket_batches").fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 16 and r["n_docs"] == 2 and r["n_batches"] == 1
    assert r["total_tokens"] == 50
    assert r["padded_tokens"] == 60  # both pad to the batch max of 30
    assert abs(r["pad_overhead"] - 1.2) < 1e-12
