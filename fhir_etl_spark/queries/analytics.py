"""Remaining OLAP surface: pivot/unpivot, exact + approximate quantiles,
approximate distinct, date arithmetic, sorted collect_set (SURVEY.md §2.4 ⊘
and §2.8 ⊘ rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "x1_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def x1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — at scale, never let Spark run the
    extra distinct-values job: name the columns."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "x2_unpivot",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    )
    """,
    tags=("pivot",),
)
def x2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) via the native unpivot operator — wide → long without
    a UNION of scans (one pass)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").cast("double").alias("custkey")
    ).unpivot(
        ids=["o_orderkey"],
        values=[("o_totalprice"), ("custkey")],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn(
        "metric", F.when(F.col("metric") == "o_totalprice", "totalprice").otherwise("custkey")
    )


@query(
    "x3_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "quantile"),
)
def x3_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). The approximate variant (x4) is the 100 TB default —
    exact percentile sorts per group."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@query("x4_approx_stats", oracle=None, tags=("agg", "approx"))
def x4_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (rows-only: HLL/KLL implementations differ
    engine-to-engine by design; tests bound their error instead)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
    )


@query(
    "x5_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 90 DAY AS VARCHAR) AS due_date,
           strftime(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS order_month,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
           dayname(o_orderdate) AS dow
    FROM orders
    """,
    tags=("function", "temporal"),
)
def x5_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: interval add, trunc, diff, parts
    (SURVEY.md §2.8 ⊘ — free via F.*)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd HH:mm:ss"
        ).alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "order_month"
        ),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format("o_orderdate", "EEEE").alias("dow"),
    )


@query(
    "x6_collect_set_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list_distinct(list(c_nationkey))), ',') AS nations
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def x6_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set rendered deterministic: sort before serializing (set
    iteration order is engine-defined, sorted CSV is not)."""
    customer = load_tables(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_set("c_nationkey")), lambda x: x.cast("string")
            ),
        ).alias("nations")
    )


@query(
    "x7_conditional_agg",
    oracle="""
    SELECT o_custkey,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority LIKE '1%'), 2) AS urgent_total
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg",),
)
def x7_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-ed aggregates (conditional aggregation without self-joins)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.round(
            F.sum(F.when(F.col("o_orderpriority").startswith("1"), F.col("o_totalprice"))),
            2,
        ).alias("urgent_total"),
    )


@query(
    "x8_variant_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("json", "variant"),
)
def x8_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path access through Spark 4's VARIANT type:
    parse_json once, variant_get typed extraction — the open-schema
    answer to the reference's props-style nested JSON (no fixed
    StructType needed, binary-encoded columnar storage at scale)."""
    events = load_tables(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.sum(
            F.try_variant_get(F.parse_json("props"), "$.k", "long")
        ).alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "g1_recursive_cte",
    oracle="""
    WITH RECURSIVE walk(node, depth) AS (
      SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, w.depth + 1
      FROM nation n JOIN walk w ON n.n_nationkey // 2 = w.node
      WHERE n.n_nationkey > 0
    )
    SELECT node, depth FROM walk
    """,
    tags=("recursive", "graph"),
)
def g1_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): walk the implicit binary-heap hierarchy
    parent(k)=k div 2 over nation keys from the root — the declarative
    twin of the iterative label-propagation operator (dedup_clusters),
    usable when the recursion IS expressible in SQL. Spark executes it as
    an iterative union loop; DuckDB runs the identical recursion
    natively (// is DuckDB's integer division, div Spark's)."""
    nation = load_tables(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation_g1_rcte")
    return spark.sql("""
      WITH RECURSIVE walk(node, depth) AS (
        SELECT n_nationkey, 0 FROM nation_g1_rcte WHERE n_nationkey = 0
        UNION ALL
        SELECT n.n_nationkey, w.depth + 1
        FROM nation_g1_rcte n JOIN walk w ON n.n_nationkey div 2 = w.node
        WHERE n.n_nationkey > 0
      )
      SELECT node, CAST(depth AS INT) AS depth FROM walk
    """)


@query(
    "x9_map_functions",
    oracle="""
    SELECT p_partkey,
           CAST(map(['brand', 'ptype'], [p_brand, p_type])['brand'][1]
                AS VARCHAR) AS brand_val,
           CAST(cardinality(map(['brand', 'ptype'],
                                [p_brand, p_type])) AS INT) AS n_keys
    FROM part
    """,
    tags=("map",),
)
def x9_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map, element_at, map_keys cardinality —
    the open-keyed sibling of the struct columns the fhirize operators
    use (SURVEY §1.2 notes the reference needs no maps; the engine
    exposes them for open schemas)."""
    part = load_tables(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("ptype"), F.col("p_type")
    )
    return part.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "x10_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct,
           round(min(CAST(o_custkey AS DOUBLE)), 4) AS min_num,
           round(max(CAST(o_custkey AS DOUBLE)), 4) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate), NULL, NULL FROM orders
    UNION ALL
    SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
           count(DISTINCT o_orderkey),
           round(min(CAST(o_orderkey AS DOUBLE)), 4),
           round(max(CAST(o_orderkey AS DOUBLE)), 4) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), NULL, NULL FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(CAST(o_totalprice AS DOUBLE)), 4),
           round(max(CAST(o_totalprice AS DOUBLE)), 4) FROM orders
    """,
    tags=("analytics", "profiling"),
)
def x10_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile (DESCRIBE/SUMMARY surface) in a single
    aggregation pass: row/null/exact-distinct counts for every column of
    `orders`, numeric min/max as rounded doubles. The operator's
    ``approx=True`` HLL tier is the corpus-scale path (rows-only by
    nature; this exact tier is the value oracle)."""
    from fhir_etl_spark.operators.profile import profile_table

    orders = load_tables(spark, sf_dir, "orders")
    return profile_table(orders)


@query(
    "dq1_quality_checks",
    oracle="""
    WITH m AS (
      SELECT
        CAST(count(*) AS DOUBLE) AS row_count,
        avg(CASE WHEN o_orderkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
          AS orderkey_completeness,
        CAST(count(DISTINCT o_orderkey) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS orderkey_uniqueness,
        CAST(count(DISTINCT o_custkey) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS custkey_uniqueness,
        CAST(min(o_totalprice) AS DOUBLE) AS totalprice_min,
        avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END)
          AS status_in_domain,
        avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                  THEN 1.0 ELSE 0.0 END) AS priority_pattern
      FROM orders
    ), rows_out AS (
      SELECT 'row_count' AS check_name, row_count AS raw,
             CAST(1 AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi FROM m
      UNION ALL SELECT 'orderkey_completeness', orderkey_completeness, 1.0, 1.0 FROM m
      UNION ALL SELECT 'orderkey_uniqueness', orderkey_uniqueness, 1.0, 1.0 FROM m
      UNION ALL SELECT 'custkey_uniqueness', custkey_uniqueness, 1.0, 1.0 FROM m
      UNION ALL SELECT 'totalprice_min', totalprice_min, 0.0, NULL FROM m
      UNION ALL SELECT 'status_in_domain', status_in_domain, 1.0, 1.0 FROM m
      UNION ALL SELECT 'priority_pattern', priority_pattern, 1.0, 1.0 FROM m
    )
    -- status from the RAW value (a 1-in-10M violation must fail a strict
    -- bound even though it rounds to 1.0); observed rounded for display
    SELECT check_name, round(raw, 6) AS observed, lo, hi,
           CASE WHEN raw IS NOT NULL
                 AND (lo IS NULL OR raw >= lo)
                 AND (hi IS NULL OR raw <= hi)
                THEN 'pass' ELSE 'fail' END AS status
    FROM rows_out
    """,
    tags=("quality", "agg"),
)
def dq1_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality suite over `orders`, evaluated
    in ONE whole-stage-codegen aggregation pass (operators/quality.py):
    completeness, key uniqueness, numeric bounds, domain and pattern
    conformance. custkey_uniqueness is a deliberately failing constraint
    (customers repeat) so the status logic is pinned end-to-end."""
    from fhir_etl_spark.operators import quality as Q

    orders = load_tables(spark, sf_dir, "orders")
    return Q.check_constraints(
        orders,
        [
            ("row_count", Q.row_count(), 1.0, None),
            ("orderkey_completeness", Q.completeness("o_orderkey"), 1.0, 1.0),
            ("orderkey_uniqueness", Q.uniqueness("o_orderkey"), 1.0, 1.0),
            ("custkey_uniqueness", Q.uniqueness("o_custkey"), 1.0, 1.0),
            ("totalprice_min", Q.col_min("o_totalprice"), 0.0, None),
            (
                "status_in_domain",
                Q.in_set_fraction("o_orderstatus", ["O", "F", "P"]),
                1.0,
                1.0,
            ),
            (
                "priority_pattern",
                Q.matches_fraction("o_orderpriority", "^[1-5]-[A-Z ]+$"),
                1.0,
                1.0,
            ),
        ],
    )


@query(
    "x12_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000.0) + 1 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS lo_seen,
           round(max(l_extendedprice), 2) AS hi_seen
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg", "profiling"),
)
def x12_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice via the native
    ``width_bucket`` (22 buckets over [0, 110000) — 5000-wide, so the
    oracle replays the binning as floor arithmetic): per-bucket count and
    seen min/max. One codegen scan + one groupBy on a 22-value key — the
    numeric-distribution profiling primitive (x10's profile_table covers
    per-column stats; this covers shape)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            F.width_bucket(
                F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(22)
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo_seen"),
            F.round(F.max("l_extendedprice"), 2).alias("hi_seen"),
        )
    )


@query(
    "dq2_drift_psi",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN o_totalprice < 0 THEN -1
                  WHEN o_totalprice >= 500000 THEN 10
                  ELSE CAST(floor(o_totalprice / 50000.0) AS INT) END AS bucket
      FROM orders
    ), cur AS (
      SELECT CASE WHEN v < 0 THEN -1
                  WHEN v >= 500000 THEN 10
                  ELSE CAST(floor(v / 50000.0) AS INT) END AS bucket
      FROM (SELECT o_totalprice + 150000.0 AS v FROM orders
            WHERE o_orderkey % 4 = 0)
    ), pb AS (
      SELECT bucket,
             CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM base) AS p FROM base GROUP BY bucket
    ), pc AS (
      SELECT bucket,
             CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM cur) AS q FROM cur GROUP BY bucket
    ), terms AS (
      SELECT coalesce(pb.bucket, pc.bucket) AS bucket,
             coalesce(p, 0.0) + 1e-6 AS p,
             coalesce(q, 0.0) + 1e-6 AS q
      FROM pb FULL OUTER JOIN pc ON pb.bucket = pc.bucket
    ), rows_out AS (
      SELECT bucket, round(p, 6) AS p_base, round(q, 6) AS p_cur,
             round((q - p) * ln(q / p), 6) AS psi_term
      FROM terms
    )
    SELECT * FROM rows_out
    UNION ALL
    SELECT CAST(NULL AS INT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           round(sum(round((q - p) * ln(q / p), 6)), 6) FROM terms
    """,
    tags=("quality", "drift"),
)
def dq2_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-shift monitoring via Population Stability Index
    (operators/quality.drift_psi): the order-price distribution vs a
    planted-drift slice (every 4th order shifted +150k), equi-width
    bucketed over a fixed [0, 500k) range, laplace-smoothed shares,
    per-bucket contributions plus the NULL-bucket total. The shift is
    large enough that the total PSI lands far above the 0.25 'investigate'
    bar — and the oracle replays every bucket share and log term."""
    from fhir_etl_spark.operators.quality import drift_psi

    orders = load_tables(spark, sf_dir, "orders")
    current = orders.filter(F.col("o_orderkey") % 4 == 0).select(
        (F.col("o_totalprice") + 150000.0).alias("o_totalprice")
    )
    return drift_psi(
        orders.select("o_totalprice"), current, "o_totalprice",
        lo=0.0, hi=500000.0, n_buckets=10,
    )


@query(
    "x13_lateral_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
    tags=("join", "lateral", "sql"),
)
def x13_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (each customer joined to its own top-2
    orders) — the SQL surface w1 expresses with window functions. The
    point is what Catalyst does with it: the correlated per-row subquery
    is DECORRELATED into a WindowGroupLimit top-k + one equi join
    (verified in the plan), never a per-customer nested-loop re-execution
    — the difference between O(n) and O(n²) subquery evaluations at
    100 TB. DuckDB runs the identical LATERAL text as the oracle."""
    load_tables(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_tables(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@query(
    "x14_kmv_quantiles",
    oracle="""
    WITH h AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
             md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                CAST(l_linenumber AS VARCHAR))) AS hh
      FROM lineitem
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY hh, v) AS rk
      FROM h
    ), s AS (
      SELECT l_returnflag, list(v ORDER BY v) AS vals
      FROM rk WHERE rk <= 64 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           vals[CAST(floor(0.25 * (len(vals) - 1)) AS INT) + 1] AS q25,
           vals[CAST(floor(0.50 * (len(vals) - 1)) AS INT) + 1] AS q50,
           vals[CAST(floor(0.75 * (len(vals) - 1)) AS INT) + 1] AS q75,
           vals[CAST(floor(0.95 * (len(vals) - 1)) AS INT) + 1] AS q95
    FROM s
    """,
    tags=("sketch", "quantiles", "agg"),
)
def x14_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k (KMV) sample sketch → per-returnflag quantile
    reads. The md5-ranked sample is fully deterministic, so the oracle
    replays sketch construction AND the nearest-rank reads value-exactly
    (selected values are raw parquet doubles — no float recompute). The
    exact-mergeability law (sketch(A ∪ B) == merge(sketch(A),
    sketch(B)), bit-for-bit) is pinned in tests/test_scd_sketch_clusters;
    see operators/sketch.kmv_sample_sketch for the scale shape."""
    from fhir_etl_spark.operators.sketch import kmv_quantiles, kmv_sample_sketch

    lineitem = load_tables(spark, sf_dir, "lineitem")
    sk = kmv_sample_sketch(
        lineitem,
        group_cols=["l_returnflag"],
        value_col="l_extendedprice",
        row_key_cols=["l_orderkey", "l_linenumber"],
        k=64,
    )
    return kmv_quantiles(sk, ["l_returnflag"], [0.25, 0.50, 0.75, 0.95])


@query(
    "x15_kmv_distinct",
    oracle="""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             md5(concat_ws('|', CAST(l_partkey AS VARCHAR))) AS hh,
             CAST(l_partkey AS DOUBLE) AS v
      FROM lineitem
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY hh, v) AS rk
      FROM h
    ), s AS (
      SELECT l_returnflag, count(*) AS n, max(hh) AS hk
      FROM rk WHERE rk <= 64 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                ELSE 63.0 / (CAST(concat('0x', substr(hk, 1, 13)) AS UBIGINT)
                             / 4503599627370496.0)
           END AS distinct_est
    FROM s
    """,
    tags=("sketch", "agg"),
)
def x15_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-value estimation, value-oracled END TO END including
    the float estimator: the sketch is built over the VALUE itself (hash
    identity = value, merge-dedup makes the sample a distinct-value
    set), then (k−1)/U_(k) with the hash fraction truncated to 52 bits
    so the double arithmetic is bit-exact across engines. The per-flag
    distinct-partkey estimate lands within the ~1/sqrt(k) band of the
    exact count (accuracy pinned in tests; value agreement pinned
    here)."""
    from fhir_etl_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sample_sketch,
    )

    lineitem = load_tables(spark, sf_dir, "lineitem")
    sk = kmv_sample_sketch(
        lineitem,
        group_cols=["l_returnflag"],
        value_col="l_partkey",
        row_key_cols=["l_partkey"],
        k=64,
    )
    return kmv_distinct_estimate(sk, ["l_returnflag"], k=64)


# --- x17: KMV set-relation estimates between corpus slices ----------------
# Element identity = md5(text) (the content digest); the sketch hashes it
# once more (kmv_sample_sketch's md5-of-row-key), so the oracle's
# md5(md5(text)) replays the identical bottom-k order. k=128; estimator
# discipline identical to x15 (52-bit hash fraction, exact-when-unsaturated).
_X17_K = 128
_X17_EST = (
    f"CASE WHEN ku < {_X17_K} THEN CAST(ku AS DOUBLE) "
    f"ELSE {_X17_K - 1}.0 / (CAST(concat('0x', substr(hu[{_X17_K}], 1, 13)) "
    "AS UBIGINT) / 4503599627370496.0) END"
)
_X17_ORACLE = f"""
    WITH idn AS (
      SELECT DISTINCT source, md5(md5(text)) AS hh FROM documents
    ), rk AS (
      SELECT source, hh,
             row_number() OVER (PARTITION BY source ORDER BY hh) AS rk
      FROM idn
    ), sk AS (
      SELECT source, list_sort(list(hh)) AS hs
      FROM rk WHERE rk <= {_X17_K} GROUP BY source
    ), pr AS (
      SELECT a.source AS group_a, b.source AS group_b, a.hs AS ha, b.hs AS hb
      FROM sk a JOIN sk b ON a.source < b.source
    ), m AS (
      SELECT group_a, group_b, ha, hb,
             list_sort(list_distinct(list_concat(ha, hb)))[1:{_X17_K}] AS hu
      FROM pr
    ), c AS (
      SELECT group_a, group_b, hu, len(hu) AS ku,
             len(list_filter(hu, x -> list_contains(ha, x)
                                  AND list_contains(hb, x))) AS rho
      FROM m
    ), est AS (
      SELECT group_a, group_b,
             {_X17_EST} AS union_est,
             CAST(rho AS DOUBLE) / ku AS jaccard_est
      FROM c
    )
    SELECT group_a, group_b, union_est,
           jaccard_est * union_est AS inter_est, jaccard_est
    FROM est
    """


@query("x17_kmv_corpus_overlap", oracle=_X17_ORACLE, tags=("sketch", "agg"))
def x17_kmv_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-overlap estimates between document sources from
    bottom-k sketches alone (theta-sketch set operations on the KMV
    construction): |A∪B|, |A∩B|, and Jaccard per source pair, computed
    from O(k) sample arrays — the corpora are never joined. The sketch
    builds once per slice and merges exactly, so at 100 TB "how much
    does this crawl overlap last month's" is a sketch-table read, not a
    scan (operators/sketch.kmv_set_relations). Value-oracled end to end
    including the float estimators (x15's 52-bit discipline)."""
    from fhir_etl_spark.operators.sketch import kmv_sample_sketch, kmv_set_relations

    documents = load_tables(spark, sf_dir, "documents")
    ident = documents.select(
        "source", F.md5("text").alias("dg"), F.lit(0.0).alias("_zero")
    )
    sk = kmv_sample_sketch(
        ident, group_cols=["source"], value_col="_zero",
        row_key_cols=["dg"], k=_X17_K,
    )
    return kmv_set_relations(sk, "source")


@query(
    "dq3_referential_integrity",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem),
    e1 AS (
      SELECT 'lineitem.l_orderkey->orders' AS edge,
             (SELECT count(*) FROM li) AS child_rows,
             (SELECT count(*) FROM li WHERE l_orderkey IS NULL) AS null_fk_rows,
             (SELECT count(*) FROM li WHERE l_orderkey IS NOT NULL
                AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphan_rows,
             (SELECT count(DISTINCT l_orderkey) FROM li WHERE l_orderkey IS NOT NULL
                AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphan_keys
    ), e2 AS (
      SELECT 'orders.o_custkey->customer' AS edge,
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
             (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
                AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
             (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_custkey IS NOT NULL
                AND o_custkey NOT IN (SELECT c_custkey FROM customer))
    ), e3 AS (
      SELECT 'lineitem.l_suppkey->supplier' AS edge,
             (SELECT count(*) FROM li),
             (SELECT count(*) FROM li WHERE l_suppkey IS NULL),
             (SELECT count(*) FROM li WHERE l_suppkey IS NOT NULL
                AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
             (SELECT count(DISTINCT l_suppkey) FROM li WHERE l_suppkey IS NOT NULL
                AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    ), e4 AS (
      SELECT 'lineitem.l_partkey->part_mod3 (planted)' AS edge,
             (SELECT count(*) FROM li),
             (SELECT count(*) FROM li WHERE l_partkey IS NULL),
             (SELECT count(*) FROM li WHERE l_partkey IS NOT NULL
                AND l_partkey NOT IN (SELECT p_partkey FROM part
                                      WHERE p_partkey % 3 = 0)),
             (SELECT count(DISTINCT l_partkey) FROM li WHERE l_partkey IS NOT NULL
                AND l_partkey NOT IN (SELECT p_partkey FROM part
                                      WHERE p_partkey % 3 = 0))
    )
    SELECT * FROM e1 UNION ALL SELECT * FROM e2
    UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
    """,
    tags=("quality", "integrity"),
)
def dq3_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK audit over the TPC-H graph: three real edges
    (lineitem→orders, orders→customer, lineitem→supplier — all clean by
    construction, pinning the zero path) plus one PLANTED broken edge
    (lineitem.l_partkey against only every third part), so non-zero
    orphan rows/keys flow through the anti-join machinery and the oracle
    value-checks them. One left-anti join per edge; |edges| output rows
    at any scale — see operators/quality.referential_integrity."""
    from fhir_etl_spark.operators.quality import referential_integrity

    lineitem, orders, customer, supplier, part = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "part"
    )
    return referential_integrity(
        [
            ("lineitem.l_orderkey->orders", lineitem, "l_orderkey",
             orders, "o_orderkey"),
            ("orders.o_custkey->customer", orders, "o_custkey",
             customer, "c_custkey"),
            ("lineitem.l_suppkey->supplier", lineitem, "l_suppkey",
             supplier, "s_suppkey"),
            ("lineitem.l_partkey->part_mod3 (planted)", lineitem, "l_partkey",
             part.filter(F.col("p_partkey") % 3 == 0), "p_partkey"),
        ]
    )


_X16_PROBES = ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it")
_X16_TOKS = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),"
    " x -> x <> '')"
)


@query(
    "x16_count_min_sketch",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest({_X16_TOKS}) AS v FROM documents
    ), pairs AS (
      SELECT r,
             CAST(CAST('0x' || substr(md5('cms#' || r || v), 1, 8)
                  AS UBIGINT) % 1024 AS BIGINT) AS col
      FROM toks, unnest(['0', '1', '2', '3']) AS g(r)
    ), counters AS (
      SELECT r AS row, col, CAST(count(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY 1, 2
    ), probes(term) AS (VALUES {", ".join(f"('{w}')" for w in _X16_PROBES)}),
    addr AS (
      SELECT term, r,
             CAST(CAST('0x' || substr(md5('cms#' || r || term), 1, 8)
                  AS UBIGINT) % 1024 AS BIGINT) AS col
      FROM probes, unnest(['0', '1', '2', '3']) AS g(r)
    ), est AS (
      SELECT term, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_estimate
      FROM addr LEFT JOIN counters ON counters.row = addr.r
                                  AND counters.col = addr.col
      GROUP BY term
    ), truec AS (
      SELECT v AS term, CAST(count(*) AS BIGINT) AS true_count
      FROM toks GROUP BY v
    )
    SELECT e.term, coalesce(t.true_count, 0) AS true_count, e.cms_estimate,
           e.cms_estimate - coalesce(t.true_count, 0) AS overcount
    FROM est e LEFT JOIN truec t ON t.term = e.term
    """,
    tags=("analytics", "sketch"),
)
def x16_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch term-frequency estimation (Cormode 2005 —
    operators/sketch.cms_counters/cms_point_query), point-queried for the
    ten t2 stopwords against their exact counts. Unlike the usual
    "approx ⇒ rows-only" trade, the md5 bucketing is deterministic, so
    the ENTIRE sketch — counter table, point queries, overcount — is
    value-oracled (the x14/x15 KMV/HLL argument). The 100 TB shape is
    the whole point: the token stream never groups per term; each
    occurrence folds into depth·width = 4096 counters with map-side
    combine, so heavy-hitter estimation over an unbounded vocabulary
    shuffles kilobytes (d7 is the exact-count twin that pays the
    per-term exchange)."""
    from fhir_etl_spark.operators.sketch import cms_counters, cms_point_query
    from fhir_etl_spark.operators.text import tokens

    documents = load_tables(spark, sf_dir, "documents")
    toks = documents.select(F.explode(tokens("text")).alias("v"))
    counters = cms_counters(toks, "v", depth=4, width=1024, salt="cms")
    probes = spark.createDataFrame(
        [(w,) for w in _X16_PROBES], "term string"
    )
    est = cms_point_query(
        counters, probes, probe_col="term", depth=4, width=1024, salt="cms"
    )
    true_counts = (
        toks.filter(F.col("v").isin(*_X16_PROBES))
        .groupBy(F.col("v").alias("term"))
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    zero = F.lit(0).cast("long")
    return est.join(true_counts, "term", "left").select(
        "term",
        F.coalesce("true_count", zero).alias("true_count"),
        "cms_estimate",
        (F.col("cms_estimate") - F.coalesce("true_count", zero)).alias(
            "overcount"
        ),
    )
