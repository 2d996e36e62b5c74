"""Per-key CUSUM change-point detection — a two-tier stateful streaming
operator: Spark 4's transformWithStateInPandas API when its runtime is
available, and an applyInPandasWithState tier with IDENTICAL semantics
that runs everywhere.

CUSUM (Page 1954, the classic sequential change detector — public
method): against a known reference level ``mu0`` with slack ``k``,
accumulate one-sided drifts

    s_pos ← max(0, s_pos + (x − mu0 − k))
    s_neg ← max(0, s_neg − (x − mu0) − k)

and alarm when either exceeds threshold ``h``; after an alarm both
accumulators reset (restart monitoring). The recursion is a running
max-accumulator with data-dependent resets — inexpressible with SQL
window frames, which is exactly the niche arbitrary-state operators
exist for.

Tier gating: transformWithState's Python driver worker needs the
``google.protobuf`` package (its state server speaks protobuf) and the
RocksDB state store provider; this container ships neither protobuf nor
a way to install it, so ``api='tws'`` raises a clear error here and the
default ``api='auto'`` selects the applyInPandasWithState tier — the
same honest-gate pattern as the Delta sink (sinks/upsert.py) and the
pydantic audit tier (operators/validate.py). Both tiers share one
scoring kernel, so semantics cannot drift.

Scale shape: state per key is two doubles — O(keys) total; micro-batch
rows are sorted (ts, event_id) within the key, so a whole-table replay
reproduces the sequential reference implementation row for row (pinned
by a stream-vs-local-model equivalence test). NULL values pass through
unscored and leave the accumulators untouched.
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
        T.StructField("s_pos", T.DoubleType()),
        T.StructField("s_neg", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

STATE_SCHEMA = "s_pos double, s_neg double"


def _score_batch(
    user_id: int,
    batch: pd.DataFrame,
    s_pos: float,
    s_neg: float,
    mu0: float,
    k: float,
    h: float,
) -> tuple[list[dict], float, float]:
    """The shared kernel: fold one (ts, event_id)-sorted micro-batch
    through the CUSUM recursion, returning output rows + final state."""
    out = []
    for event_id, v in zip(batch["event_id"], batch["value"]):
        alarm = False
        if not pd.isna(v):
            x = float(v)
            s_pos = max(0.0, s_pos + (x - mu0 - k))
            s_neg = max(0.0, s_neg - (x - mu0) - k)
            alarm = s_pos > h or s_neg > h
        out.append(
            {
                "event_id": int(event_id),
                "user_id": int(user_id),
                "s_pos": round(s_pos, 6),
                "s_neg": round(s_neg, 6),
                "alarm": alarm,
            }
        )
        if alarm:
            s_pos, s_neg = 0.0, 0.0  # restart after signalling
    return out, s_pos, s_neg


def tws_runtime_available(spark=None) -> bool:
    """transformWithState needs BOTH the protobuf package (its Python
    state-server protocol; absent here and uninstallable) AND the
    RocksDB state store provider (the HDFS-backed default does not
    support it). Checking only protobuf would mis-route 'auto' to a
    crashing tier on stock installs where protobuf happens to be
    present but the provider conf is the default."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    return "RocksDB" in (provider or "")


def _make_apply_fn(mu0: float, k: float, h: float):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        s_pos, s_neg = state.get if state.exists else (0.0, 0.0)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        out, s_pos, s_neg = _score_batch(user_id, batch, s_pos, s_neg, mu0, k, h)
        state.update((s_pos, s_neg))
        yield pd.DataFrame(out)

    return _fn


def _cusum_tws(events: DataFrame, mu0: float, k: float, h: float) -> DataFrame:
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class CusumProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("cusum", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            s_pos, s_neg = (
                tuple(self._state.get()) if self._state.exists() else (0.0, 0.0)
            )
            batch = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            out, s_pos, s_neg = _score_batch(
                user_id, batch, s_pos, s_neg, mu0, k, h
            )
            self._state.update((s_pos, s_neg))
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        CusumProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def cusum_stream(
    events: DataFrame,
    mu0: float,
    k: float = 0.5,
    h: float = 5.0,
    api: str = "auto",
) -> DataFrame:
    """Per-user CUSUM over (user_id, event_id, ts, value) → one row per
    event with both accumulators and the alarm flag. ``api``: 'auto'
    (transformWithState when its runtime exists, else
    applyInPandasWithState), 'tws', or 'applyInPandas'."""
    if api not in ("auto", "tws", "applyInPandas"):
        raise ValueError(f"api must be auto|tws|applyInPandas, got {api!r}")
    spark = events.sparkSession
    if api == "tws" and not tws_runtime_available(spark):
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(its Python state-server protocol) AND "
            "spark.sql.streaming.stateStore.providerClass="
            "...RocksDBStateStoreProvider — use api='applyInPandas' "
            "(identical semantics) or provide both"
        )
    if api == "tws" or (api == "auto" and tws_runtime_available(spark)):
        return _cusum_tws(events, mu0, k, h)
    return events.groupBy("user_id").applyInPandasWithState(
        _make_apply_fn(mu0, k, h),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_reference(values, mu0: float, k: float = 0.5, h: float = 5.0):
    """Local sequential reference (the model the stream must replay):
    [(s_pos, s_neg, alarm)] per value; None values pass through."""
    s_pos = s_neg = 0.0
    out = []
    for v in values:
        if v is None:
            out.append((round(s_pos, 6), round(s_neg, 6), False))
            continue
        s_pos = max(0.0, s_pos + (v - mu0 - k))
        s_neg = max(0.0, s_neg - (v - mu0) - k)
        alarm = s_pos > h or s_neg > h
        out.append((round(s_pos, 6), round(s_neg, 6), alarm))
        if alarm:
            s_pos = s_neg = 0.0
    return out
