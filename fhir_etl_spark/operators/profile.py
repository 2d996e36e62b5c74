"""Table profiling: per-column stats in ONE scan.

The engine-utility layer every warehouse exposes (DESCRIBE/SUMMARY):
row/null/distinct counts per column plus numeric min/max — the inputs
to skew detection, partition-column choice, and data-quality gates.

Scale shape: a single aggregation pass emits every column's stats at
once (one job, one scan); the wide 1-row result then unpivots to long
format with an ``inline`` of per-column structs — no shuffle beyond the
aggregation itself. Multiple exact ``count(DISTINCT ...)`` aggregates
expand the aggregation (one Expand row per distinct column); at corpus
scale pass ``approx=True`` to swap in HyperLogLog
``approx_count_distinct`` and keep the pass single-Expand.

Reference note: the closest reference behavior is the validate verb's
per-resource-type counts (README.md:31-38); profiling generalizes it to
per-column statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
    round_digits: int = 4,
) -> DataFrame:
    """→ (col_name, n_rows, n_nulls, n_distinct, min_num, max_num).

    ``min_num``/``max_num`` are populated (as rounded doubles) only for
    numeric columns — cross-type min/max stringification is
    engine-specific (float/timestamp formatting differs between SQL
    engines), so non-numeric columns report NULL there and rely on
    n_nulls/n_distinct.
    """
    cols = cols or df.columns
    dtypes = dict((f.name, f.dataType) for f in df.schema.fields)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    distinct_fn = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_c_{c}"))
        aggs.append(distinct_fn(c).alias(f"_d_{c}"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.round(F.min(F.col(c).cast("double")), round_digits).alias(f"_lo_{c}"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), round_digits).alias(f"_hi_{c}"))
    wide = df.agg(*aggs)

    entries = []
    for c in sorted(cols):
        numeric = isinstance(dtypes[c], _NUMERIC)
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_c_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_d_{c}").cast("long").alias("n_distinct"),
                (F.col(f"_lo_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_hi_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    return wide.select(F.inline(F.array(*entries)))
