"""Streaming sketch maintenance: fold per-micro-batch KMV bottom-k
sketches into a persistent per-group sketch table.

This is the mergeable-sketch story (operators/sketch.kmv_sample_sketch)
meeting Structured Streaming: each micro-batch builds its own bounded
sketch (map-side partial bottom-k, ≤ k rows per group cross the wire),
then :func:`fhir_etl_spark.operators.sketch.kmv_merge` folds it into the
state table — so a quantile dashboard over an unbounded stream reads a
k-row-per-group parquet table, never the stream's history.

Replay safety is real, not asserted: Structured Streaming re-runs an
epoch whose commit was lost, and ``kmv_merge`` dedups on the hashed row
identity (h, v) before the min-k rank — so re-folding the same batch is
a no-op (min-k over a SET is idempotent under re-union; the round-7
review caught that the earlier multiset rank was not). The state swap
itself (tmp/old rename protocol, crash recovery, its documented
reader-race limit) lives in :mod:`fhir_etl_spark.streaming.state`,
shared with the continuous rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir_etl_spark.operators.sketch import kmv_merge, kmv_sample_sketch
from fhir_etl_spark.streaming.state import fold_parquet_state


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
    trigger for a continuous deployment).

    ``checkpoint`` DEFAULTS to ``{state_path}.checkpoint`` (round-8
    advice fix): the state swap's crash-recovery guarantee requires the
    engine to replay an epoch whose commit was lost, which only a
    checkpointed stream can do — and the state ledger's exactly-once
    replay skip requires monotonic-unique epoch ids, likewise. An
    explicit path overrides; there is deliberately no way to opt out."""
    if checkpoint is None:
        checkpoint = f"{state_path}.checkpoint"

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = kmv_sample_sketch(
            batch_df, group_cols, value_col, row_key_cols, k=k
        )

        def merge_state(prev: DataFrame | None) -> DataFrame:
            if prev is None:
                return part
            return kmv_merge(prev.unionByName(part), group_cols, k=k)

        fold_parquet_state(spark, state_path, epoch_id, merge_state)

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
