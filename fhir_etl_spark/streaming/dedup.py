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

from fhir_etl_spark.operators.dedup import doc_band_index, lsh_bucket_keepers
from fhir_etl_spark.streaming.state import fold_parquet_state


def _state_schema(id_col: str, hash_fn: str, id_type: str = "bigint") -> str:
    """Parquet state schema keyed by the CALLER's id column (round-8
    review finding: a hardcoded 'doc_id' schema wedged the stream at
    epoch 2 for any other id_col and silently nulled the read side) AND
    the caller's id TYPE (round-9: crawl corpora commonly key on string
    doc ids — a hardcoded bigint schema misreads string state at the
    next epoch), with hash_fn validated at ENTRY — a typo must fail the
    call, not the first micro-batch inside a running stream."""
    if hash_fn == "xxhash64":
        return f"{id_col} {id_type}, band int, bucket bigint"
    if hash_fn == "md5":
        return f"{id_col} {id_type}, band int, bucket string"
    raise ValueError(f"unknown hash_fn: {hash_fn!r} (want 'xxhash64' or 'md5')")


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
    # id TYPE derived from the stream itself, not assumed: the state
    # schema must match whatever the caller keys documents by
    id_type = docs_stream.schema[id_col].dataType.simpleString()
    schema = _state_schema(id_col, hash_fn, id_type)

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # doc_band_index (not bare banded_buckets): short docs get
        # sentinel singleton rows, so the verdict contract stays TOTAL
        # over everything ever streamed (round-8 review finding)
        idx = doc_band_index(
            batch_df, id_col, text_col, num_hashes, k, bands,
            rows_per_band, hash_fn,
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
    spark: SparkSession,
    state_path: str,
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    id_type: str = "bigint",
) -> DataFrame:
    """(id, kept) off the maintained index — the pure-function read
    (operators/dedup.lsh_bucket_keepers) that matches a from-scratch
    batch build over everything streamed so far. ``id_col``/``hash_fn``/
    ``id_type`` must match the values the index was built with (the
    schema is keyed by them; a mismatch raises at entry rather than
    misreading)."""
    schema = _state_schema(id_col, hash_fn, id_type)
    return lsh_bucket_keepers(
        spark.read.schema(schema).parquet(state_path), id_col
    )
