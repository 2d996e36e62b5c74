"""Streaming shot-boundary detection — the real-time twin of the batch
m14 ``scene_cuts`` window (operators/multimodal.py), for live video/
frame-event feeds: per clip, compare each arriving frame's luma
histogram against the PREVIOUS frame's and flag a cut when more than
half the pixel mass moved bins (``2·L1 > Σh``).

State per key: one ``n_bins`` integer histogram (the previous frame) —
O(keys · n_bins) state, stream-length independent. All-integer math, so
replaying a frame table through the stream reproduces the batch window
BIT-FOR-BIT (asserted with == in tests/test_streaming.py, the
ewma/holt twin standard). Same cross-batch ordering caveat as every
per-event stateful op here: per-clip frame order across micro-batches
is assumed (or source-ordered replay).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("l1_delta", T.LongType()),
        T.StructField("is_cut", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("hist", T.ArrayType(T.LongType()))])


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (clip_id,) = key
    prev = list(state.get[0]) if state.exists else None
    batch = pd.concat(list(pdfs))
    if batch.empty:
        return
    batch = batch.sort_values("frame_index")
    out = []
    for fi, hist in zip(batch["frame_index"], batch["hist"]):
        h = [int(x) for x in hist]
        if prev is None:
            l1, cut = None, False
        else:
            l1 = sum(abs(a - b) for a, b in zip(h, prev))
            cut = 2 * l1 > sum(h)
        out.append(
            {
                "clip_id": int(clip_id),
                "frame_index": int(fi),
                "l1_delta": l1,
                "is_cut": cut,
            }
        )
        prev = h
    state.update((prev,))
    yield pd.DataFrame(out)


def scene_cuts_stream(frames: DataFrame) -> DataFrame:
    """Per-clip streaming cut detection (input needs clip_id,
    frame_index, hist: array<long>; one output row per frame)."""
    return frames.groupBy("clip_id").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
