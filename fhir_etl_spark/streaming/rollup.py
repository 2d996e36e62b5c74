"""Continuous time-bucket rollup (the 'hypertable rollup' north-star row):
a materialized hourly aggregate table maintained incrementally from a
stream — each micro-batch folds its partial aggregates into the stored
rollup instead of recomputing history.

Correct incremental maintenance requires MERGEABLE aggregates: count and
sum combine additively across batches (avg is derived at read time as
sum/count — never stored). The merge is a groupBy over (bucket, key) of
stored ∪ incoming partials — the same shape Delta MERGE or a Kafka-compacted
state topic would run at deployment scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_SCHEMA = (
    "window_start timestamp, event_type string, n bigint, total_value double"
)


def _partials(batch: DataFrame, window_size: str) -> DataFrame:
    return (
        batch.groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


def merge_rollup(existing: DataFrame, incoming_partials: DataFrame) -> DataFrame:
    """Fold new partial aggregates into the stored rollup (additive merge)."""
    return (
        existing.unionByName(incoming_partials)
        .groupBy("window_start", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("total_value").alias("total_value"))
    )


def continuous_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    table_dir: str,
    window_size: str = "1 hour",
    checkpoint: str | None = None,
):
    """Maintain ``table_dir`` (parquet) as the rolling hourly aggregate of
    the stream. Returns the streaming query (availableNow semantics are up
    to the caller's trigger).

    ``checkpoint`` DEFAULTS to ``{table_dir}.checkpoint`` (round-8
    advice fix — see streaming/state.py): replaying a lost-commit epoch
    needs a checkpointed stream, and the state ledger's exactly-once
    replay skip needs monotonic-unique epoch ids. With both in place the
    additive merge is EXACTLY-ONCE per window bucket under crash replay
    (previously documented as at-least-once)."""
    if checkpoint is None:
        checkpoint = f"{table_dir.rstrip('/')}.checkpoint"

    def _fold(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        partials = _partials(batch, window_size)

        def merge_state(existing: DataFrame | None) -> DataFrame:
            if existing is None:
                return partials
            return merge_rollup(existing, partials)

        # crash-safe swap shared with streaming/sketch.py (the previous
        # double-write here could leave a PARTIAL table if the second
        # write crashed midway — the rename protocol cannot)
        from fhir_etl_spark.streaming.state import fold_parquet_state

        fold_parquet_state(
            spark, table_dir.rstrip("/"), epoch_id, merge_state,
            schema=ROLLUP_SCHEMA,
        )

    return (
        events_stream.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the rollup with derived metrics (avg = sum/count at read time)."""
    return spark.read.schema(ROLLUP_SCHEMA).parquet(table_dir).withColumn(
        "avg_value", F.round(F.col("total_value") / F.col("n"), 4)
    )
