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
``_recover`` renames the newest ``.old.*`` back before reading, so no
committed epoch is ever lost. What this protocol does NOT give is
atomicity for CONCURRENT readers: a reader racing steps 3–4 can see a
missing path for the duration of one rename. That is the documented
limit of the local-filesystem tier (same convention as
``sinks/versioned``); production state belongs in a transactional table
format (Delta/Iceberg), where the fold body becomes a MERGE and this
module disappears.

State correctness under replay is the FOLD FUNCTION's contract, not the
swap's: Structured Streaming re-runs an epoch whose commit was lost.
KMV sketches ARE replay-idempotent (kmv_merge dedups on hashed row
identity before the min-k rank, so re-folding the same batch is a
no-op). The additive rollup is NOT — re-summing a replayed batch
double-counts, so continuous_rollup's delivery guarantee on crash
replay is at-least-once per window bucket (exactly-once there needs an
epoch ledger in the state or a transactional MERGE; documented, not
hidden).
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _recover(state_path: str) -> None:
    """If a crash stranded the state in ``.old.{epoch}`` (between swap
    steps 3 and 4), rename the newest one back; clear stale tmp dirs."""
    for tmp in glob.glob(glob.escape(state_path) + ".tmp.*"):
        shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(state_path):
        return
    olds = glob.glob(glob.escape(state_path) + ".old.*")
    if not olds:
        return
    newest = max(olds, key=lambda p: int(p.rsplit(".", 1)[-1]))
    os.rename(newest, state_path)
    for p in olds:
        if p != newest:
            shutil.rmtree(p, ignore_errors=True)


def fold_parquet_state(
    spark: SparkSession,
    state_path: str,
    epoch_id: int,
    fold_fn: Callable[[DataFrame | None], DataFrame],
    schema: str | None = None,
) -> None:
    """Run one epoch's fold: ``fold_fn(previous_state_or_None)`` → new
    state, swapped into ``state_path`` per the module protocol."""
    _recover(state_path)
    prev = None
    if os.path.isdir(state_path) and os.listdir(state_path):
        reader = spark.read if schema is None else spark.read.schema(schema)
        prev = reader.parquet(state_path)
    new_state = fold_fn(prev)
    tmp = f"{state_path}.tmp.{epoch_id}"
    new_state.write.mode("overwrite").parquet(tmp)
    old = f"{state_path}.old.{epoch_id}"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)
