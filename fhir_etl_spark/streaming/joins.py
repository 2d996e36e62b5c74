"""Stream-stream joins with watermark-bounded state.

The reference is batch-only (SURVEY.md §2.10); this is the streaming twin
of the batch interval/attribution join (queries/events.e5_click_attribution).

Scale property: a stream-stream join is only deployable when BOTH inputs
carry watermarks and the join condition bounds event time on both sides —
that is what lets Spark expire per-key join state instead of buffering
each stream forever (the unbounded-state failure mode at 100 TB/day).
Here the time-range predicate ``purchase_ts - tolerance <= click_ts <=
purchase_ts`` plus the two watermarks gives the state store a provable
eviction horizon on each side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    tolerance: str = "30 minutes",
    watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Join each purchase to the clicks of the same user within the
    preceding ``tolerance`` window. Works on streaming OR batch frames
    (same expressions; watermarks are no-ops in batch).

    Returns (purchase_id, user_id, purchase_ts, click_id, click_ts).
    For outer flavors in streaming append mode, unmatched rows emit only
    once the watermark passes the join horizon (standard semantics).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (p["user_id"] == c["c_user_id"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {tolerance}"))
    )
    return p.join(c, cond, join_type).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )
