"""Streaming heavy hitters — SpaceSaving (Metwally, Agrawal, El Abbadi
2005, "Efficient Computation of Frequent and Top-k Elements in Data
Streams"): the canonical bounded-state frequency sketch. Per group, keep
at most ``capacity`` counters; a new item evicts the CURRENT MINIMUM
counter and inherits its count + 1, so every counter over-estimates by
at most the evicted minimum — the classic guarantees hold:

- ``est(x) ≥ true(x)`` (never under-counts a tracked item),
- ``est(x) ≤ true(x) + min_counter``,
- any item with ``true(x) > N / capacity`` is guaranteed tracked.

State per group: ≤ capacity (item, count, err) triples — stream-length
independent. With ``capacity ≥`` the group's distinct-item count the
sketch degenerates to EXACT counts, which is what the stream-vs-batch
twin test pins (the d7/heavy_hitters_exact ground truth); the eviction
path and the ≤ true+err bound are pinned on a planted overflow.

Determinism caveat: like every per-event stateful op here, results
depend on arrival order (ties at the minimum evict the lexicographically
smallest tracked item so replays are reproducible given an ordered
source).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_err", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
    ]
)


def _make_fold(capacity: int, order_cols: list[str]):
    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (group,) = key
        if state.exists:
            items, counts, errs = state.get
            table: dict[str, tuple[int, int]] = {
                it: (int(c), int(e)) for it, c, e in zip(items, counts, errs)
            }
        else:
            table = {}
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(order_cols)
        for item in batch["item"]:
            item = str(item)
            if item in table:
                c, e = table[item]
                table[item] = (c + 1, e)
            elif len(table) < capacity:
                table[item] = (1, 0)
            else:
                # evict the minimum counter (ties -> smallest item, so a
                # replayed ordered stream reproduces the same sketch)
                victim = min(table, key=lambda k: (table[k][0], k))
                vc, _ = table.pop(victim)
                table[item] = (vc + 1, vc)
        state.update(
            (
                list(table.keys()),
                [c for c, _ in table.values()],
                [e for _, e in table.values()],
            )
        )
        yield pd.DataFrame(
            [
                {"group": group, "item": it, "est_count": c, "max_err": e}
                for it, (c, e) in table.items()
            ]
        )

    return _fold


def heavy_hitters_stream(
    events: DataFrame,
    capacity: int = 64,
    group_col: str = "group",
    item_col: str = "item",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group SpaceSaving over a stream of (group, item) events; each
    micro-batch emits the group's CURRENT sketch (update mode — the live
    top-k dashboard read). ``order_cols`` fixes the within-batch
    processing order (default ``["ts", "event_id"]``)."""
    if capacity < 1:
        raise ValueError(f"heavy_hitters_stream: capacity must be >= 1, got {capacity}")
    order_cols = order_cols or ["ts", "event_id"]
    stream = events.selectExpr(
        f"CAST({group_col} AS STRING) AS group",
        f"CAST({item_col} AS STRING) AS item",
        *order_cols,
    )
    return stream.groupBy("group").applyInPandasWithState(
        _make_fold(capacity, order_cols),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
