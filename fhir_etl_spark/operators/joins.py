"""Custom join operators Spark lacks natively (SURVEY.md §2.3 ⊘ row):
as-of join and bucketed range join — built as compositions of existing
DataFrame ops (preference order (a) from the engine's UDF policy), not
Pandas fallbacks.

Scale notes:
- asof_join is ONE shuffle (union + window) regardless of table sizes —
  the naive inequality-join alternative is O(|L|×|R|) per key.
- range_join_bucketed turns a pure inequality join into an equi-join on a
  bucket key + residual filter, so the shuffle partitions by bucket instead
  of exploding a cross product; bucket width tunes selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'; 'forward' = next at-or-after)
    sharing the `on` key.

    Implementation: tag and union both sides, sort within each key by
    (ts, side-order), and carry the right values forward with
    last(ignorenulls) over a running window — one shuffle on `on`,
    linear work per partition. Right rows are then dropped.

    For 'backward', right rows at ts == left_ts are visible to the left row
    (right sorts before left on ties), matching pd.merge_asof /
    DuckDB ASOF JOIN semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_proj = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_side", F.lit(0))

    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None).cast(r_proj.schema[f"_r_{c}"].dataType))
    for c in left.columns:
        if c not in (on,):
            r_proj = r_proj.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_proj.select(l_tagged.columns))

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    picker = F.last if direction == "backward" else F.first

    carried = unioned.select(
        "*",
        *[
            picker(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_match_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_match_{c}").alias(f"{c}_asof") for c in value_cols],
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi join: salt the (skewed) left side's key into
    `salt_buckets` sub-keys and replicate the right side across all salts,
    so one hot key spreads over `salt_buckets` tasks instead of one straggler.

    AQE's skew-join splitting (enabled in the session factory) handles most
    cases adaptively; explicit salting is for the pathological keys AQE's
    partition-size heuristics miss (e.g. one key = 40% of rows) or for
    non-AQE deployments. Cost: right side is replicated ×salt_buckets —
    use with a dimension-sized right side.
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    salted_right = right.withColumn("_salt", salts)
    return salted_left.join(salted_right, [on, "_salt"], how).drop("_salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    extra_on: str | None = None,
) -> DataFrame:
    """Join left rows whose `left_point` falls in [right_start, right_end):
    bucketize the point and the interval into width-`bucket_width` buckets,
    equi-join on the bucket (plus an optional equality key), then apply the
    exact residual predicate.

    Each right interval lands in ceil(len/width)+1 buckets (via sequence +
    explode); each left point in exactly one — the equi-join prunes to
    near-misses before the exact filter.
    """
    lb = F.floor(F.col(left_point) / bucket_width).cast("long")
    l_bucketed = left.withColumn("_bucket", lb)

    start_b = F.floor(F.col(right_start) / bucket_width).cast("long")
    # half-open [start, end): an exclusive end on a bucket boundary does
    # NOT occupy that bucket — ceil(end/w)-1 is the last occupied bucket
    # (greatest() guards degenerate zero-length intervals)
    end_b = F.greatest(
        start_b, F.ceil(F.col(right_end) / bucket_width).cast("long") - 1
    )
    r_bucketed = right.withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))

    on = ["_bucket"] + ([extra_on] if extra_on else [])
    joined = l_bucketed.join(r_bucketed, on)
    return joined.filter(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) < F.col(right_end))
    ).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    extra_on: str | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (the bedtools-intersect /
    genomic-region workhorse; range_join_bucketed above is its
    point-in-interval sibling): all pairs with
    ``left.start < right.end AND right.start < left.end`` (half-open
    intervals — touching endpoints do NOT overlap).

    Scale shape: both sides explode into width-``bucket_width`` buckets
    (ceil(len/width)+1 each), equi-join on the bucket (+ an optional
    equality key such as a chromosome/user id), then the exact overlap
    predicate. An overlapping pair shares ≥1 bucket, so recall is exact;
    to avoid emitting it once per shared bucket WITHOUT a distinct
    (dedup would shuffle the full candidate set again), a pair is kept
    only in its CANONICAL bucket — the bucket containing
    max(left.start, right.start), which every overlapping pair has
    exactly one of. One shuffle per side, no distinct, no theta join.
    """
    # half-open ends: an exclusive end on a bucket boundary does not
    # occupy that bucket — ceil(end/w)-1, not floor(end/w), is the last
    # occupied bucket (one dead candidate row per boundary-aligned
    # interval otherwise; correctness was unaffected, the exact
    # predicate filtered them)
    lb = F.floor(F.col(left_start) / bucket_width).cast("long")
    le = F.greatest(lb, F.ceil(F.col(left_end) / bucket_width).cast("long") - 1)
    l_bucketed = left.withColumn("_bucket", F.explode(F.sequence(lb, le)))
    rb = F.floor(F.col(right_start) / bucket_width).cast("long")
    re = F.greatest(rb, F.ceil(F.col(right_end) / bucket_width).cast("long") - 1)
    r_bucketed = right.withColumn("_bucket", F.explode(F.sequence(rb, re)))

    on = ["_bucket"] + ([extra_on] if extra_on else [])
    joined = l_bucketed.join(r_bucketed, on)
    canonical = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / bucket_width
    ).cast("long")
    return joined.filter(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (F.col("_bucket") == canonical)
    ).drop("_bucket")
