"""Window-function inventory (SURVEY.md §2.5 — ⊘ in the reference, required
by the driver inventory and the dedup/top-k operators).

Determinism note: window results depend on a total order within each
partition, so every ORDER BY here extends to a unique key
((l_orderkey, l_linenumber) is unique in lineitem; o_orderkey in orders) —
otherwise the two engines may legally disagree on ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "w1_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — one shuffle on the partition key,
    in-partition sort, no global sort. The scale path for 'top 3 orders per
    customer' on any number of customers."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "w2_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_shipdate, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_qty
    FROM lineitem
    """,
    tags=("window",),
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum within each order (running frame).

    The synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    the ordering extends to quantity/price — rows that still tie then carry
    equal quantities, making every prefix sum engine-independent."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_shipdate", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


@query(
    "w3_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(lag(o_orderdate)  OVER w AS VARCHAR) AS prev_date,
           CAST(lead(o_orderdate) OVER w AS VARCHAR) AS next_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics — prior/next order date per customer."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format(F.lag("o_orderdate").over(w), fmt).alias("prev_date"),
        F.date_format(F.lead("o_orderdate").over(w), fmt).alias("next_date"),
    )


@query(
    "w4_rank_dense_ntile",
    oracle="""
    SELECT c_custkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def w4_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a global ordering.

    An unpartitioned window is a single-reducer plan — acceptable for dims,
    never for facts; partitioned variants (w1–w3) are the scale path.
    """
    customer = load_tables(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return customer.select(
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "w5_sliding_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(avg(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM lineitem
    """,
    tags=("window",),
)
def w5_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per supplier (bounded ROWS frame)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-2, Window.currentRow)
    )
    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_extendedprice").over(w), 4).alias("ma3"),
    )


@query(
    "w6_pct_of_group",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6)
             AS price_share
    FROM orders
    """,
    tags=("window",),
)
def w6_pct_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group: unordered partition frame (whole-partition agg
    broadcast back to each row — no self-join needed)."""
    orders = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") / F.sum("o_totalprice").over(w), 6).alias(
            "price_share"
        ),
    )


@query(
    "w7_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS nearby_sum,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS nearby_n
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame (RANGE BETWEEN x PRECEDING): each order
    aggregated with the same customer's orders within a 10k price band
    below it — peers included by value, not by row position (the frame
    kind the ROWS queries w1–w6 don't exercise)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.selectExpr(
        "o_orderkey",
        "o_custkey",
        """round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS nearby_sum""",
        """CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS nearby_n""",
    )


@query(
    "w8_rolling_zscore",
    oracle="""
    SELECT event_id, user_id, round(z, 4) AS z_r,
           coalesce(abs(z) > 3.0, FALSE) AS is_anomaly
    FROM (
      SELECT event_id, user_id,
             CASE WHEN n >= 5 AND sd > 0 THEN (value - mu) / sd END AS z
      FROM (
        SELECT event_id, user_id, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(value) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
      )
    )
    """,
    tags=("window", "timeseries"),
)
def w8_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value scored
    against the SAME USER'S trailing 20 events (frame ends at 1 PRECEDING
    — the current value never contaminates its own baseline), flagged at
    |z| > 3 once ≥5 baseline points exist. The per-key trailing-frame
    shape is the streaming-feature / drift-detection workhorse: one
    shuffle on user_id, in-partition sort, sliding-frame aggregation —
    no self-join, no collect."""
    events = load_tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n = F.count("value").over(w)
    z = F.when((n >= 5) & (sd > 0), (F.col("value") - mu) / sd)
    return events.select(
        "event_id",
        "user_id",
        F.round(z, 4).alias("z_r"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "w9_ewma",
    oracle="""
    WITH RECURSIVE ordered AS MATERIALIZED (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), ew AS (
      SELECT user_id, event_id, ts, value, rn, value AS ewma
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             0.25 * o.value + 0.75 * e.ewma AS ewma
      FROM ordered o JOIN ew e ON o.user_id = e.user_id AND o.rn = e.rn + 1
    )
    SELECT user_id, event_id, ts, value, ewma FROM ew
    """,
    tags=("window", "timeseries"),
)
def w9_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha = 0.25) — the linear
    recurrence no built-in window frame can express, run as the sorted-
    array left fold in operators/timeseries.ewma (one shuffle, zero
    Python). UNROUNDED doubles on both sides: the fold's fixed
    association order plus the exactly-representable alpha makes every
    state bit-identical to the oracle's recursive-CTE replay — see the
    module docstring's exactness contract."""
    from fhir_etl_spark.operators.timeseries import ewma

    events = load_tables(spark, sf_dir, "events")
    return ewma(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.25,
    )


@query(
    "w10_holt_trend",
    oracle="""
    WITH RECURSIVE ordered AS MATERIALIZED (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), holt AS (
      SELECT user_id, event_id, ts, value, rn,
             CAST(value AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             0.25 * o.value + 0.75 * (h.level + h.trend) AS level,
             0.5 * ((0.25 * o.value + 0.75 * (h.level + h.trend)) - h.level)
               + 0.5 * h.trend AS trend
      FROM ordered o JOIN holt h ON o.user_id = h.user_id AND o.rn = h.rn + 1
    )
    SELECT user_id, event_id, ts, value, level, trend,
           level + trend AS forecast
    FROM holt
    """,
    tags=("window", "timeseries"),
)
def w10_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double-exponential smoothing (alpha = 0.25,
    beta = 0.5) over event values — level + trend recurrence with the
    one-step-ahead forecast column, run as the same sorted-array left
    fold as w9 (one shuffle, zero Python) with a 2-double struct state.
    UNROUNDED: dyadic coefficients + fixed association order make every
    (level, trend) pair bit-identical to the recursive-CTE replay; the
    trend row recomputes the new level expression textually exactly as
    the fold does, so both engines run the identical op sequence."""
    from fhir_etl_spark.operators.timeseries import holt_smoothing

    events = load_tables(spark, sf_dir, "events")
    return holt_smoothing(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.25,
        beta=0.5,
    )


@query(
    "w11_ols_trend",
    oracle="""
    WITH ranked AS MATERIALIZED (
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS x,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events
    ), sums AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ranked GROUP BY user_id HAVING count(*) >= 2
    ), sl AS (
      SELECT user_id, n, sx, sy,
             ((n * sxy - sx * sy) * CAST(1000000 AS BIGINT))
               // (n * sxx - sx * sx) AS slope_micro
      FROM sums
    )
    SELECT user_id, n, slope_micro,
           (sy * CAST(1000000 AS BIGINT) - slope_micro * sx) // n
             AS intercept_micro
    FROM sl
    """,
    tags=("window", "timeseries", "regression"),
)
def w11_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend over event values (x = event rank, y = exact
    centi-units): slope and intercept in integer micro units computed
    from BIGINT sums — bit-exact on any engine or partitioning, negative
    slopes included (integer DIV truncates toward zero identically in
    Spark and DuckDB). See operators/timeseries.ols_trend."""
    from fhir_etl_spark.operators.timeseries import ols_trend

    events = load_tables(spark, sf_dir, "events")
    return ols_trend(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
    )
