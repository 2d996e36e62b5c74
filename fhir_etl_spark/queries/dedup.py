"""Dedup inventory over the `documents` table.

Exact dedup and exact n-gram Jaccard carry full DuckDB oracles. MinHash /
SimHash / LSH are hash-dependent (xxhash64 has no DuckDB twin), so their
*internal consistency* is oracled instead where possible and the driver
records rows-only checks for the rest — the unit tests in
tests/test_dedup.py carry the semantic assertions (known near-dup pairs
found, disjoint docs not found).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import (
    chunk_dedup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_jaccard,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

_NORM_SQL = "md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))"


@query(
    "d1_exact_dedup",
    oracle=f"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY {_NORM_SQL}
    """,
    tags=("dedup",),
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized content digest; min(doc_id) representative."""
    documents = load_tables(spark, sf_dir, "documents")
    return exact_dedup(documents)


@query(
    "d2_dup_groups",
    oracle=f"""
    SELECT digest, count(*) AS n_copies,
           array_to_string(list_sort(list(doc_id)), ',') AS members
    FROM (SELECT doc_id, {_NORM_SQL} AS digest FROM documents)
    GROUP BY digest
    HAVING count(*) > 1
    """,
    tags=("dedup", "agg"),
)
def d2_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups (digest, copy count, sorted member list)."""
    documents = load_tables(spark, sf_dir, "documents")
    from fhir_etl_spark.operators.dedup import content_digest

    return (
        documents.withColumn("digest", content_digest(F.col("text")))
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_copies"),
            F.concat_ws(
                ",",
                F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ).alias("members"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "d3_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a, b, round(inter / (sa.n + sb.n - inter), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = a
               JOIN sizes sb ON sb.doc_id = b
    WHERE round(inter / (sa.n + sb.n - inter), 4) >= 0.5
    """,
    tags=("dedup", "join"),
)
def d3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.5 — the
    ground-truth verifier that LSH candidates are checked against."""
    documents = load_tables(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(documents, threshold=0.5)


@query(
    "d6_dedup_clusters",
    oracle="""
    WITH pairs AS (
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT DISTINCT doc_id, concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
        FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
      ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      WHERE round(inter / (sa.n + sb.n - inter), 4) >= 0.5
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
      -- transitive closure of (node, reachable-label); min per node = the
      -- component's smallest id (edges are bidirectional)
      WITH RECURSIVE r(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.node
      ) SELECT * FROM r
    )
    SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
    """,
    tags=("dedup", "graph"),
)
def d6_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: exact-Jaccard pairs (d3) → connected components
    via distributed min-label propagation; oracle = recursive-CTE transitive
    closure in DuckDB."""
    from fhir_etl_spark.operators.dedup import dedup_clusters

    documents = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(documents, threshold=0.5)
    return dedup_clusters(pairs)


@query(
    "d7_heavy_hitters",
    oracle="""
    SELECT l_partkey, count(*) AS freq FROM lineitem
    GROUP BY l_partkey ORDER BY freq DESC, l_partkey LIMIT 10
    """,
    tags=("agg", "sketch"),
)
def d7_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (the CMS verification ground truth,
    operators/sketch.py)."""
    from fhir_etl_spark.operators.sketch import heavy_hitters_exact

    lineitem = load_tables(spark, sf_dir, "lineitem")
    return heavy_hitters_exact(lineitem, "l_partkey", k=10)


@query("d4_minhash_lsh", oracle=None, tags=("dedup", "approx"))
def d4_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) → LSH(8 bands × 4 rows) candidate pairs with estimated
    Jaccard. Hash-dependent → rows-only driver check; semantics are pinned
    by tests/test_dedup.py (recall vs d3's exact pairs on known dups)."""
    documents = load_tables(spark, sf_dir, "documents")
    # signatures feed three plan branches (banding + both sides of the
    # jaccard join); localCheckpoint materializes the shingle pass exactly
    # once (cache() raced the three branches — unstable timings measured)
    sigs = minhash_signatures(documents).localCheckpoint()
    pairs = lsh_candidate_pairs(sigs)
    return minhash_jaccard(sigs, pairs)


@query("d5_simhash", oracle=None, tags=("dedup", "approx"))
def d5_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (rows-only: xxhash64-dependent)."""
    documents = load_tables(spark, sf_dir, "documents")
    return simhash(documents)


@query(
    "d9_chunk_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(k AS INT) AS pos,
             array_to_string(tokens[k*10+1 : k*10+10], ' ') AS chunk
      FROM toks,
           UNNEST(generate_series(0, CAST(ceil(len(tokens)/10.0) AS BIGINT) - 1)) AS t(k)
    ), keepers AS (
      SELECT chunk, min(doc_id) AS keeper FROM chunks GROUP BY chunk
    ), marked AS (
      SELECT c.doc_id, c.pos, c.chunk, (c.doc_id = s.keeper) AS keep
      FROM chunks c JOIN keepers s USING (chunk)
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '')
             AS clean_text,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
    FROM marked GROUP BY doc_id
    """,
    tags=("dedup", "text"),
)
def d9_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage removal: each distinct 10-token
    chunk survives only in its lowest-id document (operators/dedup.py
    chunk_dedup; RefinedWeb-style line dedup on a line-less corpus)."""
    docs = load_tables(spark, sf_dir, "documents")
    return chunk_dedup(docs, chunk_tokens=10)


@query("g2_pagerank", oracle=None, tags=("graph", "iterative"))
def g2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup pair graph (which documents
    sit at the center of duplicate clusters). Float summation order makes
    a cross-engine value hash inappropriate → rows-only driver check;
    the analytic small-graph test pins the math
    (operators/graph.pagerank)."""
    from fhir_etl_spark.operators.graph import pagerank

    documents = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(documents, threshold=0.5)
    edges = pairs.selectExpr("a AS src", "b AS dst").unionByName(
        pairs.selectExpr("b AS src", "a AS dst")
    )
    return pagerank(edges, n_iterations=5).select(
        "node", F.round("rank", 6).alias("rank_r")
    )
