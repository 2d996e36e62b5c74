"""Core relational operator inventory: scans, filters, joins, aggregations,
sorts/limits, set operations (SURVEY.md §2.1–2.4, §2.6, §2.7).

Every query is a pure declarative DataFrame plan — filters and projections
reach the parquet scan via Catalyst pushdown, small dimension sides are
broadcast, and aggregates are partial+final hash aggs. Double-typed
aggregates are rounded on BOTH sides (Spark and oracle) because the two
engines sum floating point in different orders.

Reference semantics being generalized (citations into /root/reference/):
- filters: substring `document_references.py:132-134` (P3), equality
  `gtex_fhirizer.py:79` (P4), dropna `document_references.py:156` (P5),
  prefix `document_references.py:169` (P6), positional drop
  `gtex_fhirizer.py:83` (P7), dict lookup `oneKg_fhirizer.py:163` (P8)
- joins: set intersection/difference `document_references.py:209-216`
  (J1/J2), scalar enrichment `document_references.py:240-241` (J4),
  FK construction `oneKg_fhirizer.py:117` (J5)
- aggregations: per-type counts `cli.py:34-36` (A1), set cardinality
  `document_references.py:207-216` (A2), member collection
  `document_references.py:218,236` (A3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


# ---------------------------------------------------------------------------
# Aggregation pipelines (TPC-H-shaped)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash agg with 8 aggregates.

    The filter pushes to the parquet scan; the groupBy is a two-phase
    (partial/final) hash aggregate — the map-side combine means shuffle
    volume is O(groups), not O(rows), which is what survives 100 TB.
    """
    lineitem = load_tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → deterministic top-k.

    customer scales with SF, so no broadcast hint — AQE converts the join
    to broadcast at runtime whenever the filtered dimension is actually
    small. The tiebreak on l_orderkey makes LIMIT deterministic across
    engines.
    """
    customer, orders, lineitem = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1994-01-01'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; only the BOUNDED dims broadcast.

    region/nation are fixed-cardinality → explicit broadcast. customer and
    supplier scale linearly with SF, so they get NO hint (a hardcoded
    broadcast OOMs the driver at 100× SF); AQE broadcasts them at runtime
    when they fit. The fact-fact orders⋈lineitem shuffle and the final tiny
    agg are the only unavoidable exchanges.
    """
    customer, orders, lineitem, supplier, nation, region = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        lineitem.join(
            orders.filter(F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Filters (P3–P8)
# ---------------------------------------------------------------------------


@query(
    "p3_filter_substring",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE contains(lower(p_name), 'gre')
    """,
    tags=("filter",),
)
def p3_filter_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: case-insensitive substring row filter.

    Generalizes the reference's `"vcf" not in file.lower()` keep-filter
    (document_references.py:132-134).
    """
    part = load_tables(spark, sf_dir, "part")
    return part.filter(F.lower(F.col("p_name")).contains("gre")).select("p_partkey", "p_name")


@query(
    "p4_filter_equality",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    tags=("filter",),
)
def p4_filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: equality filter (gtex_fhirizer.py:79) — pushed to the scan."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")


@query(
    "p5_filter_dropna",
    oracle="""
    SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri
    FROM orders
    WHERE nullif(o_orderpriority, '1-URGENT') IS NOT NULL
    """,
    tags=("filter", "null"),
)
def p5_filter_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: drop-null-subset filter (document_references.py:156).

    The testdata has no natural NULLs, so a NULL-bearing column is derived
    with nullif on both sides; `na.drop(subset=...)` then exercises the
    same truth table as pandas `dropna(subset=['file'])`.
    """
    orders = load_tables(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri"),
        )
        .na.drop(subset=["pri"])
    )


@query(
    "p6_filter_prefix",
    oracle="SELECT c_custkey, c_name FROM customer WHERE starts_with(c_name, 'Customer#00000001')",
    tags=("filter",),
)
def p6_filter_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: prefix filter — the `#CHROM` header-line scan
    (document_references.py:169) as a general startswith predicate."""
    customer = load_tables(spark, sf_dir, "customer")
    return customer.filter(F.col("c_name").startswith("Customer#00000001")).select(
        "c_custkey", "c_name"
    )


@query(
    "p7_positional_drop",
    oracle="""
    SELECT r_regionkey, r_name FROM (
      SELECT r_regionkey, r_name,
             row_number() OVER (ORDER BY r_regionkey) AS rn
      FROM region
    ) WHERE rn > 1
    """,
    tags=("filter", "window"),
)
def p7_positional_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: positional row drop (`df.drop([0])`, gtex_fhirizer.py:83).

    Spark has no stable row order, so "drop the first row" must name an
    ordering: row_number over an explicit sort key, then filter rn > 1.
    """
    from pyspark.sql import Window

    region = load_tables(spark, sf_dir, "region")
    w = Window.orderBy("r_regionkey")
    return (
        region.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("r_regionkey", "r_name")
    )


@query(
    "p8_case_lookup",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE WHEN n_name IN ('CHINA', 'JAPAN', 'INDIA', 'INDONESIA', 'VIETNAM')
                THEN 'APAC'
                WHEN n_name IN ('FRANCE', 'GERMANY', 'ROMANIA', 'RUSSIA', 'UNITED KINGDOM')
                THEN 'EMEA'
                ELSE 'OTHER' END AS bloc
    FROM nation
    """,
    tags=("projection",),
)
def p8_case_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: dictionary/CASE lookup (sequencing-center map, oneKg_fhirizer.py:139,163).

    Chained `when` stays in whole-stage codegen; a broadcast dim join is the
    scale path once the mapping outgrows a literal expression.
    """
    nation = load_tables(spark, sf_dir, "nation")
    apac = ["CHINA", "JAPAN", "INDIA", "INDONESIA", "VIETNAM"]
    emea = ["FRANCE", "GERMANY", "ROMANIA", "RUSSIA", "UNITED KINGDOM"]
    return nation.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_name").isin(apac), "APAC")
        .when(F.col("n_name").isin(emea), "EMEA")
        .otherwise("OTHER")
        .alias("bloc"),
    )


# ---------------------------------------------------------------------------
# Joins (J1–J5 + general equi/outer/cross)
# ---------------------------------------------------------------------------


@query(
    "j1_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    tags=("join",),
)
def j1_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner semi join = the reference's set intersection for Group
    membership (document_references.py:209-210). Broadcast-able whenever the
    probe-side distinct keys are small (ID sets are KBs–MBs)."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    big_orders = orders.filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti join = the reference's set difference (missing-ID report,
    document_references.py:211)."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j3_semi_join_normalized_key",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE lpad(CAST(o_custkey % 100 AS VARCHAR), 2, '0') =
            string_split(c_name, '#')[-1][-2:]
    )
    """,
    tags=("join", "function"),
)
def j3_semi_join_normalized_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: semi join after key normalization — the GTEx SAMPID suffix
    normalization (`'-'.join(sampid.split('-')[-2:])`, gtex_fhirizer.py:92-95)
    generalized: both sides derive a comparison key before the semi join.
    """
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    cust_key = customer.withColumn(
        "norm_key",
        F.substring(F.element_at(F.split(F.col("c_name"), "#"), -1), -2, 2),
    )
    order_key = orders.select(
        F.lpad((F.col("o_custkey") % 100).cast("string"), 2, "0").alias("norm_key")
    )
    return cust_key.join(order_key, "norm_key", "left_semi").select("c_custkey", "c_name")


@query(
    "j4_broadcast_scalar_join",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 6) AS price_ratio
    FROM orders
    """,
    tags=("join", "agg"),
)
def j4_broadcast_scalar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: broadcast scalar enrichment — stamping every row with a
    single-row query result (the Group reference, document_references.py:240-241).
    A crossJoin(broadcast(1-row-df)) is a zero-shuffle nested-loop."""
    orders = load_tables(spark, sf_dir, "orders")
    max_price = orders.agg(F.max("o_totalprice").alias("max_price"))
    return orders.crossJoin(F.broadcast(max_price)).select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") / F.col("max_price"), 6).alias("price_ratio"),
    )


@query(
    "j5_left_join_fk",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("join",),
)
def j5_left_join_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: FK traversal as a left join with a broadcast dimension
    (the general form of the reference's re-hash-instead-of-join,
    oneKg_fhirizer.py:117)."""
    customer, nation = load_tables(spark, sf_dir, "customer", "nation")
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    ).select("c_custkey", "c_name", "n_name")


@query(
    "j6_full_outer_join",
    oracle="""
    SELECT coalesce(a.k, b.k) AS k, a.cnt_o AS cnt_o, b.cnt_l AS cnt_l
    FROM (SELECT o_orderstatus AS k, count(*) AS cnt_o FROM orders GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT l_linestatus AS k, count(*) AS cnt_l FROM lineitem GROUP BY 1) b
    ON a.k = b.k
    """,
    tags=("join", "agg"),
)
def j6_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi join (⊘ in the reference; free in Spark)."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    a = orders.groupBy(F.col("o_orderstatus").alias("k")).agg(F.count("*").alias("cnt_o"))
    b = lineitem.groupBy(F.col("l_linestatus").alias("k")).agg(F.count("*").alias("cnt_l"))
    return a.join(b, "k", "full_outer").select(
        F.col("k"), F.col("cnt_o"), F.col("cnt_l")
    )


@query(
    "j7_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def j7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims (broadcast nested loop)."""
    region, nation = load_tables(spark, sf_dir, "region", "nation")
    return region.crossJoin(F.broadcast(nation)).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Aggregations (A1–A3, cube/rollup/grouping sets)
# ---------------------------------------------------------------------------


@query(
    "a1_count_by_type",
    oracle="SELECT o_orderstatus AS resource_type, count(*) AS n FROM orders GROUP BY 1",
    tags=("agg",),
)
def a1_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-type counts — the `validate` CLI summary (cli.py:34-36)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("resource_type")).agg(
        F.count("*").alias("n")
    )


@query(
    "a2_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct cardinality per group (document_references.py:207-216);
    `approx_count_distinct` is the 100 TB variant (see a2b)."""
    customer = load_tables(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@query(
    "a3_collect_members",
    oracle="""
    SELECT c_nationkey AS group_key,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS members,
           count(*) AS n_members
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def a3_collect_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: collect group members into one value (Group.member[],
    document_references.py:218,236). sort_array(collect_list) makes the
    result deterministic regardless of partitioning; rendered as a CSV
    string so both engines hash identically."""
    customer = load_tables(spark, sf_dir, "customer")
    return customer.groupBy(F.col("c_nationkey").alias("group_key")).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("c_custkey")), lambda x: x.cast("string")
            ),
        ).alias("members"),
        F.count("*").alias("n_members"),
    )


@query(
    "a4_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def a4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two grouping columns (⊘ in reference; driver inventory)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "a5_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price")
    )


@query(
    "a6_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan)."""
    load_tables(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "a7_having",
    oracle="""
    SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_partkey HAVING count(*) >= 8
    """,
    tags=("agg", "filter"),
)
def a7_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("n") >= 8)
    )


@query(
    "a8_min_max_stats",
    oracle="""
    SELECT o_orderstatus,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           round(stddev_samp(o_totalprice), 4) AS sd_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a8_min_max_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/stddev grouped aggregates (min/max of doubles are exact —
    no rounding needed; stddev is rounded on both sides)."""
    orders = load_tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1)
# ---------------------------------------------------------------------------


@query(
    "o1_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_shipdate
    LIMIT 20
    """,
    tags=("topk",),
)
def o1_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject — each
    partition keeps k rows, the driver merges; no full sort at any scale."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber", "l_shipdate")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "o2_order_by_multi",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    LIMIT 50
    """,
    tags=("sort",),
)
def o2_order_by_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort + limit."""
    customer = load_tables(spark, sf_dir, "customer")
    return (
        customer.select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_mktsegment", F.desc("c_acctbal"), "c_custkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


@query(
    "set1_union_all",
    oracle="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
    tags=("setop",),
)
def set1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) — the REST page concatenation
    (`all_data.extend(...)`, gtex_fhirizer.py:67,73) as unionByName."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    return a.unionByName(b)


@query(
    "set2_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — row-level set intersection."""
    orders = load_tables(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@query(
    "set3_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    tags=("setop",),
)
def set3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — set difference at row granularity."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    a = customer.select(F.col("c_custkey").alias("k"))
    b = orders.select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).distinct()


@query(
    "set4_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("setop",),
)
def set4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-based dedup of the key pair)."""
    lineitem = load_tables(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus").distinct()
