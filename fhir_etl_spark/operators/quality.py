"""Declarative data-quality constraint checking (the deequ/expectations
concept, Catalyst-native): a suite of table-level constraints evaluated in
ONE aggregation pass over the data, returning a tidy result table
(check_name, observed, lo, hi, status).

Why one pass matters at 100 TB: each constraint is an aggregate
expression (a completeness ratio, a distinct ratio, a min/max, a
conformance fraction), and Spark evaluates any number of them in a single
whole-stage-codegen scan with map-side partial aggregation — checking 50
constraints costs the same scan as checking one. The alternative most
validation frameworks default to (one query per check) re-reads the table
per constraint.

The result explode is plan-side too: the 1-row aggregate becomes N
constraint rows via an inline array — no driver collect, so the checker
composes into larger plans (e.g. gate a write on `status = 'fail'` rows).

Builders cover the standard constraint vocabulary:
- completeness(col)            — fraction non-null
- uniqueness(col)              — distinct / total (1.0 ⇔ key candidate)
- col_min / col_max(col)       — numeric bounds
- in_set_fraction(col, vals)   — domain conformance
- matches_fraction(col, re)    — pattern conformance (RE must be a
  Java/RE2-agreeing subset if an external oracle replays it)
- row_count()                  — table size bounds

Reference parity: the reference validates row dicts in Python per-record
(validate.py tier); this is the distributed, single-scan generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, Column, float | None, float | None]


def completeness(col: str) -> Column:
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    return F.count_distinct(F.col(col)).cast("double") / F.count(F.lit(1))


def col_min(col: str) -> Column:
    return F.min(F.col(col)).cast("double")


def col_max(col: str) -> Column:
    return F.max(F.col(col)).cast("double")


def in_set_fraction(col: str, values: Sequence[str]) -> Column:
    return F.avg(F.col(col).isin(list(values)).cast("double"))


def matches_fraction(col: str, pattern: str) -> Column:
    return F.avg(F.col(col).rlike(pattern).cast("double"))


def row_count() -> Column:
    return F.count(F.lit(1)).cast("double")


def check_constraints(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate ``checks`` = [(name, aggregate Column, lo, hi)] in one
    aggregation pass → (check_name, observed, lo, hi, status) with
    status = 'pass' iff lo ≤ observed ≤ hi (None bound = unbounded;
    a NULL observation — e.g. min of an all-null column — fails).

    Observed values are rounded to 6 decimals so the report is stable
    across partitioning (float ratios) and replayable by an external
    oracle.
    """
    if not checks:
        raise ValueError("check_constraints needs at least one check")
    names = [c[0] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    row = df.agg(
        *[F.round(obs.cast("double"), 6).alias(name) for name, obs, _, _ in checks]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("observed"),
                F.lit(lo).cast("double").alias("lo"),
                F.lit(hi).cast("double").alias("hi"),
            )
            for name, _, lo, hi in checks
        ]
    )
    ok = F.col("c.observed").isNotNull()
    ok = ok & ((F.col("c.lo").isNull()) | (F.col("c.observed") >= F.col("c.lo")))
    ok = ok & ((F.col("c.hi").isNull()) | (F.col("c.observed") <= F.col("c.hi")))
    return (
        row.select(F.explode(entries).alias("c"))
        .select(
            "c.check_name",
            "c.observed",
            "c.lo",
            "c.hi",
            F.when(ok, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
        )
    )
