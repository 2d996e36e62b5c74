"""Streaming EWMA — the real-time twin of the batch w9 query
(operators/timeseries.ewma), built on applyInPandasWithState like the
rolling z-score scorer (streaming/anomaly.py): a linear recurrence is
per-event stateful by nature, so no built-in streaming window expresses
it.

State per key: ONE double (the last smoothed value) — O(keys) state,
independent of stream length, the smallest state any stateful operator
carries. Each micro-batch sorts its group by (ts, event_id) and folds
``s = alpha*x + (1-alpha)*s`` — the SAME two IEEE multiplies and one add
the batch fold compiles to, in the same association order, so replaying
a table through the stream in one batch reproduces the batch query
BIT-FOR-BIT (asserted exactly, not approximately, in
tests/test_streaming.py — stronger than the z-score twin's 2e-4 bound,
possible because EWMA never reassociates a sum).

Caveat shared with every per-event stateful op here: correctness across
micro-batches assumes per-key event-time order across batches (or
source-ordered replay); out-of-order arrivals would need a watermarked
reorder buffer in front.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("s", T.DoubleType())])


def _make_fold(alpha: float):
    beta = 1.0 - alpha

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        s = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        out = []
        for event_id, v in zip(batch["event_id"], batch["value"]):
            if pd.isna(v):
                # mirror the batch operator's loud NULL contract
                raise ValueError(
                    "ewma stream: NULL value would poison all later state "
                    f"for user {user_id}; filter or impute upstream"
                )
            v = float(v)
            s = v if s is None else alpha * v + beta * s
            out.append(
                {
                    "event_id": int(event_id),
                    "user_id": int(user_id),
                    "value": v,
                    "ewma": s,
                }
            )
        state.update((s,))
        yield pd.DataFrame(out)

    return _fold


def ewma_stream(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user streaming EWMA (input needs user_id, event_id, ts, value;
    one output row per event). Same alpha contract as the batch
    operator."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma_stream: alpha must be in (0, 1], got {alpha}")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fold(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("forecast", T.DoubleType()),
    ]
)

HOLT_STATE_SCHEMA = T.StructType(
    [T.StructField("l", T.DoubleType()), T.StructField("b", T.DoubleType())]
)


def _make_holt_fold(alpha: float, beta: float):
    ac, bc = 1.0 - alpha, 1.0 - beta

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        lvl, trd = state.get if state.exists else (None, None)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        out = []
        for event_id, v in zip(batch["event_id"], batch["value"]):
            if pd.isna(v):
                raise ValueError(
                    "holt stream: NULL value would poison all later state "
                    f"for user {user_id}; filter or impute upstream"
                )
            v = float(v)
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                new_l = alpha * v + ac * (lvl + trd)
                trd = beta * (new_l - lvl) + bc * trd
                lvl = new_l
            out.append(
                {
                    "event_id": int(event_id),
                    "user_id": int(user_id),
                    "value": v,
                    "level": lvl,
                    "trend": trd,
                    "forecast": lvl + trd,
                }
            )
        state.update((lvl, trd))
        yield pd.DataFrame(out)

    return _fold


def holt_stream(
    events: DataFrame, alpha: float = 0.25, beta: float = 0.5
) -> DataFrame:
    """Streaming Holt double-exponential smoothing — the real-time twin
    of the batch w10 fold (operators/timeseries.holt_smoothing). State
    per key: TWO doubles (level, trend). Each step is the identical IEEE
    op sequence the batch fold compiles to — ``a·x + (1−a)·(l+b)`` then
    ``β·(l'−l) + (1−β)·b`` — in the same association order, so replaying
    a table through the stream reproduces the batch query BIT-FOR-BIT
    (asserted with == in tests/test_streaming.py, the ewma_stream
    standard). Same ordering caveat as every per-event stateful op here:
    per-key event-time order across micro-batches is assumed."""
    for name, p in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < p <= 1.0:
            raise ValueError(f"holt_stream: {name} must be in (0, 1], got {p}")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_holt_fold(alpha, beta),
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
