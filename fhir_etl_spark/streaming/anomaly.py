"""Streaming rolling z-score anomaly detection — the real-time twin of
the batch w8 query (queries/windows.w8_rolling_zscore), built on
applyInPandasWithState because no built-in streaming window expresses a
per-EVENT trailing-rows frame (session/tumbling windows aggregate per
window, not per row; the batch window function needs the whole partition).

State per user: the last ``window`` values (a bounded array — state size
is O(users × window), independent of stream length; pair with a timeout
in production to expire idle users). Each micro-batch is sorted by
(ts, event_id) within the group, every event is scored against the
values that PRECEDED it (the batch twin's `ROWS BETWEEN 20 PRECEDING AND
1 PRECEDING` frame), then appended to the ring. Replaying a table
through the stream in one batch therefore reproduces the batch query
row-for-row — pinned by tests/test_streaming.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("z_r", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("values", T.ArrayType(T.DoubleType()))]
)


def _make_score(window: int, min_periods: int, threshold: float):
    def _score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        # the ring mirrors the batch ROWS frame exactly: NULL-valued
        # events OCCUPY a slot (they push older rows out of the frame)
        # but contribute nothing to the statistics — Spark's windowed
        # avg/stddev/count skip NULLs the same way. NULLs are stored as
        # NaN (the state array type is non-nullable-unfriendly across
        # Arrow round trips; NaN round-trips fine).
        vals: list[float] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        out = []
        for event_id, v in zip(batch["event_id"], batch["value"]):
            v = float("nan") if pd.isna(v) else float(v)
            present = [x for x in vals if not math.isnan(x)]
            z = None
            n = len(present)
            if n >= max(min_periods, 2):  # stddev_samp needs ≥2 points
                mu = sum(present) / n
                var = sum((x - mu) ** 2 for x in present) / (n - 1)
                sd = math.sqrt(var)
                if sd > 0 and not math.isnan(v):
                    z = (v - mu) / sd
            out.append(
                {
                    "event_id": int(event_id),
                    "user_id": int(user_id),
                    "z_r": round(z, 4) if z is not None else None,
                    "is_anomaly": bool(z is not None and abs(z) > threshold),
                }
            )
            vals.append(v)
            if len(vals) > window:
                vals = vals[-window:]
        state.update((vals,))
        yield pd.DataFrame(out)

    return _score


def rolling_zscore_stream(
    events: DataFrame,
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-user streaming z-score vs the trailing ``window`` values
    (current event excluded from its own baseline). Input needs
    (user_id, event_id, ts, value); output one row per event.
    NULL-valued events occupy a frame slot but are never scored and
    never enter the baseline — identical to the batch twin's windowed
    avg/stddev NULL semantics."""
    if min_periods < 1:
        raise ValueError(f"min_periods must be >= 1, got {min_periods}")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_score(window, min_periods, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
