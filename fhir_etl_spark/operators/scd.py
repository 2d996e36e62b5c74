"""Slowly-changing-dimension type-2 merge without Delta (guide 'CDC/SCD2'
row): emulated with anti-join + union + window — the incremental-history
counterpart of the engine's S9 upsert.

Contract: a current dimension snapshot (with valid_from/valid_to/is_current
columns) + a batch of incoming changes keyed by business key → new snapshot
where changed rows are closed out (valid_to set) and new versions appended.
At scale this runs inside foreachBatch per micro-batch; with Delta jars the
same logic is a two-branch MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 00:00:00"


def scd2_init(snapshot: DataFrame, key: str, effective_ts: str) -> DataFrame:
    """Bootstrap an SCD2 table from a plain snapshot."""
    return snapshot.select(
        "*",
        F.col(effective_ts).alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    effective_ts: str,
    compare_cols: list[str],
) -> DataFrame:
    """Apply a change batch to an SCD2 history.

    - unchanged keys: history rows pass through untouched
    - changed/new keys: current row closed (valid_to := change ts,
      is_current := false), new version appended open-ended
    - true no-op changes (all compare_cols equal) are dropped, not versioned

    Every step is a broadcast-able equi-join on the business key; history
    never rewrites rows that didn't change (at file level that maps to
    partition overwrite / Delta MERGE, not a full rewrite).
    """
    current = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    cmp_cond = None
    for c in compare_cols:
        neq = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"chg.{c}"))
        cmp_cond = neq if cmp_cond is None else (cmp_cond | neq)

    joined = current.alias("cur").join(
        changes.alias("chg"), F.col(f"cur.{key}") == F.col(f"chg.{key}"), "full_outer"
    )

    # ONE pass over the join: filtering three disposition branches out of
    # `joined` would execute the full-outer join three times (it is the
    # operator's only shuffle, over the full dimension). Instead each
    # joined row emits an array of 0-2 output structs (a changed row
    # yields its closed-out version AND its new version) which one
    # explode flattens — the join runs once and the plan stays narrow.
    has_cur = F.col(f"cur.{key}").isNotNull()
    has_chg = F.col(f"chg.{key}").isNotNull()

    def _struct(per_col) -> F.Column:
        return F.struct(*[per_col(c).alias(c) for c in history.columns])

    close_struct = _struct(
        lambda c: F.col(f"chg.{effective_ts}")
        if c == "valid_to"
        else (F.lit(False) if c == "is_current" else F.col(f"cur.{c}"))
    )
    untouched_struct = _struct(lambda c: F.col(f"cur.{c}"))
    # new versions align to the history schema; the effective-ts column
    # only survives if history carries it
    new_struct = _struct(
        lambda c: F.col(f"chg.{effective_ts}")
        if c == "valid_from"
        else (
            F.lit(OPEN_END).cast("timestamp")
            if c == "valid_to"
            else (F.lit(True) if c == "is_current" else F.col(f"chg.{c}"))
        )
    )
    emitted = joined.select(
        F.explode_outer(  # outer + post-filter per the inferred-filter rule
            F.array(
                F.when(has_cur & has_chg & cmp_cond, close_struct),
                F.when(has_cur & (~has_chg | ~cmp_cond), untouched_struct),
                F.when(has_chg & (~has_cur | cmp_cond), new_struct),
            )
        ).alias("s")
    ).where(F.col("s").isNotNull())

    return closed.unionByName(emitted.select("s.*"))
