"""Custom stateful streaming operator via applyInPandasWithState — the
engine's example of semantics Spark's built-in windows can't express: a
per-user running profile (event count, value sum, last-seen) that emits an
updated row per micro-batch and expires idle users via processing-time
timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _make_update_profile(expire_ms: int | None):
    def _update_profile(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "total_value": total,
                        "expired": True,
                    }
                ]
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if expire_ms is not None:
            state.setTimeoutDuration(expire_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "total_value": round(total, 2),
                    "expired": False,
                }
            ]
        )

    return _update_profile


def user_profiles(events: DataFrame, expire_ms: int | None = None) -> DataFrame:
    """Stateful per-user aggregation.

    ``expire_ms`` arms a processing-time timeout that emits an `expired`
    tombstone and clears state for idle users — the production setting for
    continuous triggers. Leave it None under trigger(availableNow): armed
    timers keep re-scheduling batches and the query never terminates
    (observed hang, not theoretical).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(expire_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
