"""Sequence packing: greedy first-fit of documents into fixed token-budget
training sequences.

The trainer-prep step after shuffle/sharding (operators/datasets.py): each
shard's documents are packed, in the shard's deterministic hash order,
into sequences of at most ``budget`` tokens (docs longer than the budget
get a sequence of their own). The recurrence "start a new sequence when
the running total would overflow" is inherently sequential per shard —
not expressible as a window cumsum (a cumsum-bucket split would SPLIT a
doc across the boundary instead of moving it whole) — so it runs as an
Arrow-batched applyInPandas per shard: parallel ACROSS shards, sequential
within a shard, which is exactly the trainer's own consumption order.

Scale shape: one hash shuffle by shard (reusing the shard_shuffle layout),
then per-shard linear scans. Shard count bounds parallelism; at 100 TB you
size n_shards to the cluster (e.g. 10–100× executors), keeping each
shard's doc list comfortably in one task's memory (ids + counts only —
the text itself never enters the packing plan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_etl_spark.operators.datasets import hash_bucket

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("seq_offset", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign each document a (shard, seq_id, seq_offset) packing slot.

    ``seq_id`` is globally unique (shard-major: shard * 2^40 + local index);
    ``seq_offset`` is the document's token offset inside its sequence.
    Deterministic: order within a shard is (md5(salt+id), id) — identical
    on every run and cluster size.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (hash_bucket(F.col(id_col), salt=salt) % n_shards).cast("int")
    order = F.md5(
        F.concat(F.lit(f"{salt}:ord"), F.col(id_col).cast("string")).cast("binary")
    )
    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        shard.alias("shard"),
        order.alias("_order"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_order", "doc_id"], kind="mergesort")
        shard_id = int(pdf["shard"].iloc[0])
        base = shard_id << 40
        seq_ids, offsets = [], []
        local_seq, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                local_seq += 1
                used = 0
            seq_ids.append(base + local_seq)
            offsets.append(used)
            used += n
            if used >= budget:  # full (or oversized doc): next doc starts fresh
                local_seq += 1
                used = 0
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["seq_id"] = seq_ids
        out["seq_offset"] = offsets
        return out[["doc_id", "shard", "seq_id", "seq_offset", "n_tokens"]]

    return slim.groupBy("shard").applyInPandas(_pack, schema=PACKED_SCHEMA)
