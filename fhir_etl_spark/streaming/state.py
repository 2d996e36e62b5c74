"""Shared micro-batch state fold for driver-local parquet state tables.

One implementation of the read-state / merge / swap cycle that
``streaming/sketch.py`` (KMV quantile state) and ``streaming/rollup.py``
(continuous hourly rollup) both fold through — so the crash semantics
live in exactly one place (round-7 review: three divergent swap
mechanisms had accumulated, each with its own failure window).

Swap protocol per epoch:

1. write the new state to ``{path}.tmp.{epoch}`` (stale tmp from a
   crashed attempt is removed first; the write is the only long step);
2. remove any stale ``{path}.old.{epoch}`` (left by a crashed REPLAY of
   this same epoch — without this, rename into it raises ENOTEMPTY and
   the stream wedges permanently);
3. retire the current state dir to ``{path}.old.{epoch}``;
4. rename the tmp into place; drop the old.

A crash between 3 and 4 leaves no state dir — the next fold's
``_recover`` renames the newest ``.old.*`` back before reading.
IMPORTANT (round-8 advice fix): that restore DISCARDS the epoch's
completed fold (the tmp is deleted), so "no committed epoch is ever
lost" holds ONLY when Structured Streaming can replay the epoch whose
commit was lost — i.e. only with a ``checkpointLocation``. Both entry
points (``stream_kmv_sketch``, ``continuous_rollup``) therefore now
DEFAULT a checkpoint directory derived from the state path instead of
making it optional; epochs are then monotonic and unique across
restarts, which the epoch ledger below relies on.

What this protocol does NOT give is atomicity for CONCURRENT readers:
a reader racing steps 3–4 can see a missing path for the duration of
one rename. That is the documented limit of the local-filesystem tier
(same convention as ``sinks/versioned``); production state belongs in
a transactional table format (Delta/Iceberg), where the fold body
becomes a MERGE and this module disappears.

Replay semantics (round 8): the swap stamps a ``_LAST_EPOCH`` ledger
file inside the state dir (underscore-prefixed — parquet readers skip
it). When Structured Streaming replays an epoch that the state already
absorbed (crash after step 4 but before the stream's own commit), the
fold SKIPS it — making every fold function exactly-once under replay,
including the additive rollup that was previously at-least-once.
Idempotent folds (KMV's dedup-before-rank merge) keep their own
guarantee as a second line of defense. The ledger requires
monotonic-unique epoch ids, i.e. a checkpointed stream — which the
entry points now guarantee by default.
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _recover(state_path: str) -> None:
    """If a crash stranded the state in ``.old.{epoch}`` (between swap
    steps 3 and 4), rename the newest one back; clear stale tmp dirs.

    When the state dir EXISTS, any surviving ``.old.*`` is debris from a
    crash between step 4 and the final cleanup — remove it too (round-8
    review: one such dir leaked per crash, and though the max-epoch
    pick keeps recovery correct, an unbounded crash history should not
    accumulate state-sized directories)."""
    for tmp in glob.glob(glob.escape(state_path) + ".tmp.*"):
        shutil.rmtree(tmp, ignore_errors=True)
    olds = glob.glob(glob.escape(state_path) + ".old.*")
    if os.path.exists(state_path):
        for p in olds:
            shutil.rmtree(p, ignore_errors=True)
        return
    if not olds:
        return
    newest = max(olds, key=lambda p: int(p.rsplit(".", 1)[-1]))
    os.rename(newest, state_path)
    for p in olds:
        if p != newest:
            shutil.rmtree(p, ignore_errors=True)


_LEDGER = "_LAST_EPOCH"


def _last_epoch(state_path: str) -> int | None:
    try:
        with open(os.path.join(state_path, _LEDGER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def fold_parquet_state(
    spark: SparkSession,
    state_path: str,
    epoch_id: int,
    fold_fn: Callable[[DataFrame | None], DataFrame],
    schema: str | None = None,
) -> None:
    """Run one epoch's fold: ``fold_fn(previous_state_or_None)`` → new
    state, swapped into ``state_path`` per the module protocol.

    Exactly-once under epoch REPLAY: if the state's ``_LAST_EPOCH``
    ledger already records ``epoch_id``, the state absorbed this epoch
    before the stream's commit was lost — the fold is skipped instead
    of re-applied (the fix that upgrades additive folds like the
    rollup from at-least-once). Correct only for monotonic-unique
    epoch ids, i.e. a checkpointed stream; the entry points default a
    checkpoint for exactly this reason."""
    _recover(state_path)
    if _last_epoch(state_path) == epoch_id:
        return  # replayed epoch the state already absorbed — skip
    prev = None
    if os.path.isdir(state_path) and os.listdir(state_path):
        reader = spark.read if schema is None else spark.read.schema(schema)
        prev = reader.parquet(state_path)
    new_state = fold_fn(prev)
    tmp = f"{state_path}.tmp.{epoch_id}"
    new_state.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _LEDGER), "w") as f:
        f.write(str(epoch_id))
    old = f"{state_path}.old.{epoch_id}"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)
