"""Similarity-search inventory over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.operators.similarity import cosine_topk, lsh_topk
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

# Fixed probe vectors: the corpus rows with these ids act as queries
# (deterministic, present at every SF since ids are dense from 0).
_QUERY_IDS = (1, 2, 3)


@query(
    "v1_cosine_topk",
    oracle=f"""
    SELECT query_id, vec_id, sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rank
      FROM embeddings c
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id IN {_QUERY_IDS}) q
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for three probe vectors. Similarity
    is rounded before ranking (tie-break vec_id) so Spark and DuckDB rank
    identically despite float-sum ordering."""
    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(embeddings, queries, k=5)


@query(
    "v3_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 300 AND b.vec_id < 300
      AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.55
    """,
    tags=("similarity", "dedup"),
)
def v3_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bounded id slice (the oracle
    is the O(n²) ground truth; the corpus-scale path runs the same operator
    inside LSH buckets)."""
    from fhir_etl_spark.operators.similarity import embedding_neardup_pairs

    embeddings = load_tables(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_neardup_pairs(embeddings, threshold=0.55)


@query("v4_ivf_topk", oracle=None, tags=("similarity", "approx"))
def v4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5 (rows-only: recall < 1 by design;
    tests pin self-match and probe behavior)."""
    from fhir_etl_spark.operators.similarity import ivf_topk

    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(embeddings, queries, k=5)


@query("v2_lsh_topk", oracle=None, tags=("similarity", "approx"))
def v2_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-5 (rows-only: recall < 1 by
    design; tests assert the self-match and bucket behavior)."""
    embeddings = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(embeddings, queries, k=5, dim=64)
