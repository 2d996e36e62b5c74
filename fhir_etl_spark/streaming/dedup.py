"""Incremental corpus dedup: maintain a banded MinHash-LSH index as
micro-batch state, so each new crawl increment is deduped against the
ENTIRE history without ever rescanning it — the operation a 100 TB
training-data pipeline actually runs (the corpus arrives continuously;
re-running batch LSH over all of it per increment is quadratic in wall
time over the corpus's life).

Why this state is exactly foldable: a document's banded index rows
depend only on the document (operators/dedup.banded_buckets), so
``index(∪ batches) == ∪ index(batch)`` — the streamed fold reproduces
the whole-corpus index BIT-FOR-BIT, and every read off it (keeper
verdicts via :func:`lsh_bucket_keepers`, candidate mining via the
posting lists) matches what a from-scratch batch build would answer.
The fold dedups on the full (band, bucket, doc_id) row, making replay a
no-op on top of the state ledger's exactly-once skip
(streaming/state.py).

State size is the dedup index itself — bands × corpus rows of three
scalars (the signature bytes never enter the state). At deployment
scale the same fold body targets a transactional table (MERGE on the
triple) instead of the local parquet-swap tier; the semantics above are
what make that a drop-in swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir_etl_spark.operators.dedup import (
    banded_buckets,
    lsh_bucket_keepers,
    minhash_signatures,
)
from fhir_etl_spark.streaming.state import fold_parquet_state

_STATE_SCHEMA_XXH = "doc_id bigint, band int, bucket bigint"
_STATE_SCHEMA_MD5 = "doc_id bigint, band int, bucket string"


def stream_lsh_dedup_index(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    k: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
    checkpoint: str | None = None,
):
    """Maintain the banded LSH index table at ``state_path`` from a
    streaming DataFrame of documents. Returns the started query
    (availableNow trigger — drop it for continuous deployment).

    ``checkpoint`` defaults to ``{state_path}.checkpoint`` — same
    rationale as the other streaming folds (streaming/state.py: the
    crash-recovery guarantee needs epoch replay, and the epoch ledger
    needs monotonic-unique ids)."""
    if checkpoint is None:
        checkpoint = f"{state_path}.checkpoint"
    schema = _STATE_SCHEMA_XXH if hash_fn == "xxhash64" else _STATE_SCHEMA_MD5

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = banded_buckets(
            minhash_signatures(
                batch_df, id_col, text_col, num_hashes, k, hash_fn
            ),
            id_col,
            bands,
            rows_per_band,
            hash_fn,
        )

        def merge_state(prev: DataFrame | None) -> DataFrame:
            if prev is None:
                return idx
            # full-row dedup: re-folding any subset (overlapping shards,
            # replayed epochs) is a no-op — set-union semantics
            return prev.unionByName(idx).dropDuplicates(
                [id_col, "band", "bucket"]
            )

        fold_parquet_state(spark, state_path, epoch_id, merge_state, schema=schema)

    return (
        docs_stream.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_dedup_verdicts(
    spark: SparkSession, state_path: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, kept) off the maintained index — the pure-function read
    (operators/dedup.lsh_bucket_keepers) that matches a from-scratch
    batch build over everything streamed so far."""
    schema = _STATE_SCHEMA_XXH if hash_fn == "xxhash64" else _STATE_SCHEMA_MD5
    return lsh_bucket_keepers(spark.read.schema(schema).parquet(state_path))
