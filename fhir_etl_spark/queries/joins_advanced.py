"""Advanced join inventory: as-of join, bucketed range join, theta join —
the operators Spark lacks natively, built in operators/joins.py as
compositions of DataFrame ops (SURVEY.md §2.3 ⊘ row)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.operators.joins import asof_join, range_join_bucketed, salted_join
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


def _clicks_and_purchases(spark, sf_dir):
    events = load_tables(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.col("ts").cast("double").alias("t")
    )
    # dedup right to one row per (user, ts): max value — ties between right
    # rows at identical timestamps would otherwise be engine-dependent
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("double").alias("t"))
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )
    return clicks, purchases


@query(
    "r1_asof_join_backward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, epoch(ts) AS t FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, epoch(ts) AS t, round(max(value), 2) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.user_id, c.event_id, p.purchase_value AS purchase_value_asof
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.t >= p.t
    """,
    tags=("join", "asof"),
)
def r1_asof_join_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click annotated with the user's most recent prior
    purchase value. One shuffle (union + running window) at any scale."""
    clicks, purchases = _clicks_and_purchases(spark, sf_dir)
    return asof_join(
        clicks, purchases, on="user_id", left_ts="t", right_ts="t",
        value_cols=["purchase_value"],
    ).select("user_id", "event_id", "purchase_value_asof")


@query(
    "r2_asof_join_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, epoch(ts) AS t FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, epoch(ts) AS t, round(max(value), 2) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.user_id, c.event_id, p.purchase_value AS purchase_value_asof
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.t <= p.t
    """,
    tags=("join", "asof"),
)
def r2_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: the NEXT purchase at-or-after each click."""
    clicks, purchases = _clicks_and_purchases(spark, sf_dir)
    return asof_join(
        clicks, purchases, on="user_id", left_ts="t", right_ts="t",
        value_cols=["purchase_value"], direction="forward",
    ).select("user_id", "event_id", "purchase_value_asof")


@query(
    "r3_range_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, b.band_id
    FROM orders o
    JOIN (SELECT range AS band_id,
                 range * 20000.0 AS lo,
                 range * 20000.0 + 30000.0 AS hi
          FROM range(0, 25)) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    tags=("join", "range"),
)
def r3_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join against OVERLAPPING price bands
    ([k*20000, k*20000+30000)) — the bucketed equi-join + residual-filter
    plan instead of a quadratic inequality join."""
    orders = load_tables(spark, sf_dir, "orders")
    bands = spark.range(0, 25).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20000.0).alias("lo"),
        (F.col("id") * 20000.0 + 30000.0).alias("hi"),
    )
    joined = range_join_bucketed(
        orders, bands, left_point="o_totalprice", right_start="lo",
        right_end="hi", bucket_width=10000.0,
    )
    return joined.select("o_orderkey", "band_id")


@query(
    "j8_theta_join",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey <> r.r_regionkey
    """,
    tags=("join", "theta"),
)
def j8_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (inequality) join — broadcast nested loop over tiny dims; the
    engine keeps theta joins to dimension-scale sides by policy."""
    nation, region = load_tables(spark, sf_dir, "nation", "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey != region.r_regionkey
    ).select("n_name", "r_name")


@query(
    "j9_skew_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("join", "skew"),
)
def j9_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim equi join (operators/joins.salted_join): the
    hot-key rows spread over salt_buckets tasks; the dim side replicates
    ×salt_buckets. Result is IDENTICAL to the plain join — the oracle is
    the plain join, which is exactly the operator's correctness contract
    (salting must never change semantics)."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    joined = salted_join(
        lineitem.select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("k")),
        part.select(F.col("p_partkey").alias("k"), "p_name"),
        on="k",
        salt_buckets=8,
    )
    return joined.select("l_orderkey", "l_linenumber", "p_name")


@query(
    "j10_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 5 END AS k
      FROM orders
    ), r AS (
      SELECT CASE WHEN g.k = 5 THEN NULL ELSE g.k END AS k, g.k AS tag
      FROM (SELECT unnest(generate_series(0, 5)) AS k) g
    )
    SELECT l.o_orderkey, r.tag
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    tags=("join", "null-safe"),
)
def j10_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys match
    NULL keys — plans as a hash join on the null-safe key, unlike a plain
    equi join which silently drops every NULL row."""
    orders = load_tables(spark, sf_dir, "orders")
    left = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 5)
        .alias("k"),
    )
    right = spark.range(0, 6).select(
        F.when(F.col("id") == 5, None).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("tag"),
    )
    return left.join(right, left["k"].eqNullSafe(right["k"])).select(
        "o_orderkey", "tag"
    )


@query(
    "j11_fuzzy_match",
    oracle="""
    WITH corrupted AS (
      SELECT c_custkey AS b_id,
             substr(c_name, 1, pos - 1) || 'X' || substr(c_name, pos + 1)
               AS b_text
      FROM (SELECT c_custkey, c_name,
                   CAST((c_custkey % 10) + 9 AS INT) AS pos
            FROM customer WHERE c_custkey % 3 = 0)
    )
    SELECT c.c_custkey AS a_id, b.b_id,
           CAST(levenshtein(c.c_name, b.b_text) AS INT) AS distance
    FROM customer c JOIN corrupted b
      ON levenshtein(c.c_name, b.b_text) <= 1
    """,
    tags=("join", "fuzzy", "linkage"),
)
def j11_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage under typos: customer names with one planted
    character substitution fuzzy-joined back to the clean roster at
    Levenshtein ≤ 1 via FastSS deletion-variant blocking
    (operators/linkage.py) — candidates from an equi join on
    ≤1-deletion variants (provably complete for distance 1), then the
    exact levenshtein verify. The oracle IS the quadratic compare the
    blocking avoids, so any missed candidate breaks the hash. The
    near-uniform TPC-H names make this adversarial: each corrupted name
    legitimately matches ~10 roster entries differing only in the
    corrupted digit."""
    from fhir_etl_spark.operators.linkage import fuzzy_match_pairs

    customer = load_tables(spark, sf_dir, "customer")
    roster = customer.select(
        F.col("c_custkey").alias("a_id"), F.col("c_name").alias("a_text")
    )
    pos = (F.col("c_custkey") % 10 + 9).cast("int")
    corrupted = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("b_id"),
        F.concat(
            F.substring(F.col("c_name"), F.lit(1), pos - 1),
            F.lit("X"),
            F.substring(F.col("c_name"), pos + 1, F.length("c_name")),
        ).alias("b_text"),
    )
    return fuzzy_match_pairs(roster, corrupted, max_distance=1)


@query(
    "r4_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS a_id, user_id,
             round(value, 2) AS s1, round(value, 2) + 7 AS e1
      FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT event_id AS b_id, user_id,
             round(value * 2, 2) AS s2, round(value * 2, 2) + 4 AS e2
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a_id, b_id,
           round(least(e1, e2) - greatest(s1, s2), 2) AS overlap_len
    FROM a JOIN b ON a.user_id = b.user_id
                 AND s1 < e2 AND s2 < e1
    """,
    tags=("join", "interval", "genomics"),
)
def r4_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators/joins.interval_overlap_join —
    the genomic-region/bedtools-intersect shape): click activity windows
    × purchase windows per user, bucketized so every pair meets in its
    canonical bucket exactly once (no distinct, no theta join). The
    oracle is the plain quadratic theta join the bucketing avoids — a
    missed bucket or double-counted pair breaks the hash."""
    from fhir_etl_spark.operators.joins import interval_overlap_join

    events = load_tables(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.round("value", 2).alias("s1"),
        (F.round("value", 2) + 7).alias("e1"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        "user_id",
        F.round(F.col("value") * 2, 2).alias("s2"),
        (F.round(F.col("value") * 2, 2) + 4).alias("e2"),
    )
    out = interval_overlap_join(
        clicks, purchases, "s1", "e1", "s2", "e2",
        bucket_width=8.0, extra_on="user_id",
    )
    return out.select(
        "a_id", "b_id",
        F.round(F.least("e1", "e2") - F.greatest("s1", "s2"), 2).alias(
            "overlap_len"
        ),
    )
