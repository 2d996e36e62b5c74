"""Training-pipeline hygiene queries: benchmark decontamination, text
normalization, sequence packing (operators/contamination.py, packing.py,
text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "d8_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat(t[i], ' ', t[i+1], ' ', t[i+2]) AS shingle
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
      WHERE len(t) >= 3
    )
    SELECT c.doc_id, count(*) AS n_hits
    FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
    JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0) b
      ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
    tags=("training", "dedup", "join"),
)
def d8_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 3-gram with the
    'benchmark' slice (every 97th doc), with the distinct-shingle hit
    count (k=3 keeps the synthetic corpus's hit set large enough to be a
    real oracle — 171 docs at sf0.01; production uses k=8..13). The
    benchmark shingle set broadcasts; the corpus is filtered map-side —
    no corpus shuffle."""
    from fhir_etl_spark.operators.contamination import contamination_hits

    documents = load_tables(spark, sf_dir, "documents")
    benchmark = documents.filter(F.col("doc_id") % 97 == 0)
    corpus = documents.filter(F.col("doc_id") % 97 != 0)
    return contamination_hits(corpus, benchmark, k=3)


@query(
    "t5_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
    tags=("training", "text"),
)
def t5_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for dedup/fingerprint keys: lowercase → strip
    non-alphanumerics → collapse runs of spaces → trim. Pure codegen
    projection (both regexes are ASCII classes, so Java and RE2 agree)."""
    documents = load_tables(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return documents.select("doc_id", norm.alias("norm_text"))


@query("ds5_pack_sequences", oracle=None, tags=("training", "stateful"))
def ds5_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit packing of documents into 2048-token sequences
    (whitespace token counts), 8 shards. Sequential-per-shard recurrence →
    applyInPandas; not SQL-expressible, driver does the rows-only check
    (unit tests pin the packing invariants: tests/test_training.py)."""
    from fhir_etl_spark.operators.packing import pack_sequences
    from fhir_etl_spark.operators.text import token_count

    documents = load_tables(spark, sf_dir, "documents")
    with_counts = documents.withColumn("n_tokens", token_count(F.col("text")))
    return pack_sequences(with_counts, "n_tokens", budget=2048, n_shards=8)
