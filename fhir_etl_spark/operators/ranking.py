"""Distributed global dense ranking — the primitive a suffix-array
build needs at every prefix-doubling round, and the one Spark's window
API only offers through a SINGLE-PARTITION window (``Window.orderBy``
with no partitionBy moves the whole input through one task — the exact
anti-pattern this repo's plan audits exist to catch).

The standard distributed formulation instead:

1. ``repartitionByRange`` on the key columns — Spark's range
   partitioner samples the keys and assigns contiguous KEY RANGES to
   partitions, so equal keys always land together;
2. per-partition local dense_rank (a window PARTITIONED by
   ``spark_partition_id()`` — parallel across partitions);
3. one BOUNDED driver collect of per-partition distinct-key counts
   (≤ shuffle-partition-count rows), turned into prefix offsets;
4. global rank = partition offset + local rank, applied via a literal
   CASE over the partition id (no join — the offsets table is tiny).

Total cost per call: one range shuffle + one hash shuffle + one
bounded collect. Rank values are DENSE within the key domain (equal
keys share a rank; ranks increase with key order with no gaps), which
is exactly the contract prefix doubling needs (equality ⇔ equal
prefix, order ⇔ prefix order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_dense_rank_with_count(
    df: DataFrame, key_cols: list[str], out_col: str = "rank"
) -> tuple[DataFrame, int]:
    """:func:`distributed_dense_rank` plus the TOTAL distinct-key count
    — free: the builder already collects per-partition distinct counts
    for the prefix offsets, and their sum IS the global count. Callers
    that loop until ranks are unique (prefix doubling's early exit) can
    compare it against the row count instead of paying one extra
    count/countDistinct aggregation job per round."""
    return _dense_rank_impl(df, key_cols, out_col)


def distributed_dense_rank(
    df: DataFrame, key_cols: list[str], out_col: str = "rank"
) -> DataFrame:
    """Append ``out_col``: the global dense rank (0-based) of the row's
    key tuple under ascending NULLS FIRST order, without ever moving
    the dataset through one partition. Deterministic for any input
    partitioning (ranks depend only on key values)."""
    return _dense_rank_impl(df, key_cols, out_col)[0]


def _dense_rank_impl(
    df: DataFrame, key_cols: list[str], out_col: str = "rank"
) -> tuple[DataFrame, int]:
    keys = [F.col(c) for c in key_cols]
    parted = df.repartitionByRange(*keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*keys)
    local = parted.withColumn("_lrank", F.dense_rank().over(w) - 1)
    # EAGER checkpoint before the offsets collect: the ranked frame is
    # consumed twice (the sizes collect below, then the caller's plan),
    # and two independent executions of repartitionByRange can sample
    # DIFFERENT range boundaries / AQE-coalesce differently — the _pid
    # stamps the offsets were computed from would then disagree with
    # the _pid values the final projection sees, silently corrupting
    # ranks. Invisible at small data (trivial boundaries), measured at
    # 200k docs (round-9 d13 smoke: planted docs fully removed).
    local = local.localCheckpoint(eager=True)
    # bounded collect: one row per shuffle partition. The partition's
    # distinct-key count IS its max local dense rank + 1 (dense_rank
    # increments exactly once per distinct key, NULL groups included —
    # the ADVICE r09 null contract holds by construction), so a
    # primitive max over the already-computed _lrank replaces the
    # count_distinct(struct(...)) re-hash of every key (r13: the
    # offsets job no longer rebuilds a distinct hash table per
    # partition; it reads the checkpoint and folds one int).
    sizes = {
        r["_pid"]: r["_n"] + 1
        for r in local.groupBy("_pid").agg(F.max("_lrank").alias("_n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(0).cast("long")).limit(0), 0
    off = F.when(F.col("_pid") == list(offsets)[0], F.lit(offsets[list(offsets)[0]]))
    for pid, o in list(offsets.items())[1:]:
        off = off.when(F.col("_pid") == pid, F.lit(o))
    ranked = local.withColumn(
        out_col, (off.cast("long") + F.col("_lrank")).alias(out_col)
    ).drop("_pid", "_lrank")
    return ranked, acc
