"""as-of / range join operator edge cases (tie semantics, empty matches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_etl_spark.operators.joins import asof_join, range_join_bucketed


def test_asof_backward_tie_and_miss(spark):
    left = spark.createDataFrame(
        [(1, 5.0, "L1"), (1, 2.0, "L2"), (2, 3.0, "L3")], "k long, t double, tag string"
    )
    right = spark.createDataFrame(
        [(1, 2.0, "R@2"), (1, 4.0, "R@4"), (2, 9.0, "R@9")], "k long, t double, v string"
    )
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()
    }
    assert out["L1"] == "R@4"  # most recent <= 5.0
    assert out["L2"] == "R@2"  # tie at t=2.0: right visible (>= semantics)
    assert out["L3"] is None  # no prior right row → left kept, null match


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 3.0, "L")], "k long, t double, tag string")
    right = spark.createDataFrame(
        [(1, 1.0, "past"), (1, 3.0, "now"), (1, 7.0, "later")], "k long, t double, v string"
    )
    out = asof_join(left, right, "k", "t", "t", ["v"], direction="forward").collect()
    assert out[0]["v_asof"] == "now"  # at-or-after, tie included


def test_range_join_bucketed_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0), (5, 100.0)], "id long, p double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 30.0)], "name string, lo double, hi double"
    )
    out = range_join_bucketed(points, intervals, "p", "lo", "hi", bucket_width=7.0)
    got = sorted((r["id"], r["name"]) for r in out.collect())
    # [lo, hi): 10.0 not in 'a'; 25.0 only in 'b'; 100.0 nowhere
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "b")]

def test_interval_overlap_join_semantics(spark):
    """Strict half-open overlap: touching endpoints don't match;
    containment/identity do; pairs spanning many shared buckets emit
    exactly once (canonical-bucket dedup); negative coordinates work."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 21.0), (3, -15.0, -5.0), (4, 0.0, 100.0)],
        "a_id long, s1 double, e1 double",
    )
    right = spark.createDataFrame(
        [(10, 5.0, 6.0),     # contained in 1 and 4
         (11, 10.0, 12.0),   # touches 1's end -> NO match with 1; overlaps 4
         (12, -100.0, 200.0),  # spans everything (many shared buckets)
         (13, -10.0, -9.0)],   # negative range, inside 3
        "b_id long, s2 double, e2 double",
    )
    pairs = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            left, right, "s1", "e1", "s2", "e2", bucket_width=3.0
        ).collect()
    )
    assert pairs == sorted([
        (1, 10), (1, 12),
        (2, 12),
        (3, 12), (3, 13),
        (4, 10), (4, 11), (4, 12),
    ])
    # each pair exactly once despite bucket_width 3 (pair (4,12) shares
    # ~34 buckets)
    assert len(pairs) == len(set(pairs))


def test_interval_overlap_join_matches_brute_force(spark):
    """Randomized cross-check: the bucketed canonical-pair formulation
    equals the brute-force O(n²) pair set across several bucket widths,
    including widths much larger and much smaller than the intervals."""
    import random

    random.seed(42)
    left_rows = [
        (i, s := round(random.uniform(-50, 50), 1), s + round(random.uniform(0.1, 30), 1))
        for i in range(80)
    ]
    right_rows = [
        (1000 + i, s := round(random.uniform(-50, 50), 1), s + round(random.uniform(0.1, 30), 1))
        for i in range(80)
    ]
    expect = sorted(
        (a, b)
        for a, s1, e1 in left_rows
        for b, s2, e2 in right_rows
        if s1 < e2 and s2 < e1
    )
    from fhir_etl_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(left_rows, "a_id long, s1 double, e1 double")
    right = spark.createDataFrame(right_rows, "b_id long, s2 double, e2 double")
    for width in (0.5, 3.0, 25.0, 500.0):
        got = sorted(
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(
                left, right, "s1", "e1", "s2", "e2", bucket_width=width
            ).collect()
        )
        assert got == expect, f"width {width}: {len(got)} vs {len(expect)}"
