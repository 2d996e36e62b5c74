"""Training-dataset assembly as driver-gate queries (operators/datasets.py).

Every assignment is a pure function of the row key (md5 bucket), so the
DuckDB oracle reproduces the EXACT row-level decision — these are not
rows-only checks; the oracle verifies each row's split/sample/shard/pos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

# DuckDB twin of operators/datasets.hash_bucket (BUCKETS = 1e6)
_BUCKET = (
    "CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8) "
    "AS UBIGINT) % 1000000"
)


@query(
    "ds1_hash_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN b < 800000 THEN 'train'
                WHEN b < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET.format(salt='split', key='doc_id')} AS b
          FROM documents)
    """,
    tags=("datasets", "split"),
)
def ds1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment — stable per-row
    under re-runs, repartitioning, and dataset growth (cumulative-range
    property keeps val/test membership fixed when train grows)."""
    from fhir_etl_spark.operators.datasets import split_assign

    documents = load_tables(spark, sf_dir, "documents")
    return split_assign(
        documents, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "ds2_stratified_sample",
    oracle=f"""
    SELECT event_id, event_type
    FROM (SELECT event_id, event_type,
                 {_BUCKET.format(salt='sample', key='event_id')} AS b
          FROM events)
    WHERE b < CASE event_type
                WHEN 'error' THEN 500000
                WHEN 'purchase' THEN 200000
                ELSE 50000 END
    """,
    tags=("datasets", "sample"),
)
def ds2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: upweight rare strata (error 50%,
    purchase 20%), downsample the rest to 5% — the class-rebalance step of
    a training pipeline, as a pure filter (no shuffle, no RNG)."""
    from fhir_etl_spark.operators.datasets import stratified_sample

    events = load_tables(spark, sf_dir, "events")
    return stratified_sample(
        events,
        "event_type",
        "event_id",
        {"error": 0.5, "purchase": 0.2},
        default_fraction=0.05,
    ).select("event_id", "event_type")


@query(
    "ds3_weighted_mix",
    oracle=f"""
    SELECT doc_id, src FROM (
      SELECT doc_id, 'web' AS src,
             {_BUCKET.format(salt='mix:web', key='doc_id')} AS b
      FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
      UNION ALL
      SELECT doc_id, 'curated' AS src,
             {_BUCKET.format(salt='mix:curated', key='doc_id')} AS b
      FROM documents WHERE source = 'src4'
    )
    WHERE (src = 'web' AND b < 300000) OR (src = 'curated' AND b < 900000)
    """,
    tags=("datasets", "mix"),
)
def ds3_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing at target rates: a big 'web' slice kept at 30%, a
    small 'curated' slice at 90% — per-source hash-downsampling + tagged
    zero-shuffle union (unionByName aligns heterogeneous schemas)."""
    from fhir_etl_spark.operators.datasets import weighted_mix

    documents = load_tables(spark, sf_dir, "documents")
    web = documents.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    curated = documents.filter(F.col("source") == "src4")
    return weighted_mix(
        {"web": (web, 0.3), "curated": (curated, 0.9)}, key="doc_id"
    ).select("doc_id", "src")


@query(
    "ds4_shard_shuffle",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             CAST({_BUCKET.format(salt='shuffle', key='doc_id')} % 8 AS INT)
               AS shard,
             md5('shuffle:pos' || CAST(doc_id AS VARCHAR)) AS ord
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
                AS INT) AS pos
    FROM hashed
    """,
    tags=("datasets", "shuffle"),
)
def ds4_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible shuffle into 8 ordered shards: ONE hash shuffle +
    per-shard local sort (no global range sort — the ORDER BY rand()
    anti-pattern at 100 TB). The oracle verifies every (shard, pos)
    assignment row-by-row."""
    from fhir_etl_spark.operators.datasets import shard_shuffle

    documents = load_tables(spark, sf_dir, "documents")
    return shard_shuffle(documents, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos"
    )
