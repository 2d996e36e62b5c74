"""Streaming sketch maintenance: fold per-micro-batch KMV bottom-k
sketches into a persistent per-group sketch table.

This is the mergeable-sketch story (operators/sketch.kmv_sample_sketch)
meeting Structured Streaming: each micro-batch builds its own bounded
sketch (map-side partial bottom-k, ≤ k rows per group cross the wire),
then :func:`fhir_etl_spark.operators.sketch.kmv_merge` folds it into the
state table — so a quantile dashboard over an unbounded stream reads a
k-row-per-group parquet table, never the stream's history.

Replay safety comes from the sketch algebra, not from the sink: min-k is
IDEMPOTENT under re-union (min-k(S ∪ S) = min-k(S)), so re-processing an
uncommitted epoch after a crash converges to the same state — the same
exactly-once-by-idempotence argument as the S9 streaming upsert
(streaming/windows.stream_upsert_ndjson), pinned by the restart test.

State writes go through a temp dir + rename swap; a reader that races
the swap sees the previous complete state, never a partial write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from fhir_etl_spark.operators.sketch import kmv_merge, kmv_sample_sketch


def stream_kmv_sketch(
    spark: SparkSession,
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    row_key_cols: list[str],
    state_path: str,
    k: int = 64,
    checkpoint: str | None = None,
):
    """Maintain a per-group KMV sketch table at ``state_path`` from a
    streaming DataFrame. Returns the started query (availableNow
    trigger — the batch-twin test drives it to completion; drop the
    trigger for a continuous deployment)."""

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = kmv_sample_sketch(
            batch_df, group_cols, value_col, row_key_cols, k=k
        )
        if os.path.exists(state_path):
            prev = spark.read.parquet(state_path)
            part = kmv_merge(prev.unionByName(part), group_cols, k=k)
        tmp = f"{state_path}.tmp.{epoch_id}"
        part.write.mode("overwrite").parquet(tmp)
        old = f"{state_path}.old.{epoch_id}"
        if os.path.exists(state_path):
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
