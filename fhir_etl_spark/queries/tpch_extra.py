"""Additional TPC-H-shaped queries: correlated and scalar subqueries,
EXISTS/NOT-IN patterns, join-then-distribute shapes — the subquery surface
of the ⊘ join/agg rows (Catalyst rewrites them to joins; the inventory
pins that the rewrites stay correct)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-07-01'
      AND o_orderdate < TIMESTAMP '1994-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS with a non-equi conjunct → left-semi join
    on orderkey with the l_shipdate > o_orderdate residual."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1994-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1994-10-01").cast("timestamp"))
    )
    matched = window_orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left join with an ON-clause filter (NOT a WHERE — nulls
    survive), double aggregation."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q17_scalar_subquery",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p_partkey = l_partkey
    WHERE p_size < 10
      AND l_quantity < (SELECT 0.8 * avg(l_quantity) FROM lineitem
                        WHERE l_partkey = p_partkey)
    """,
    tags=("join", "agg", "subquery"),
)
def q17_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery — expressed as
    a pre-aggregated per-key threshold joined back onto the fact (part
    scales with SF → no broadcast hint; AQE decides at runtime)."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.8).alias("qty_threshold")
    )
    small_parts = part.filter(F.col("p_size") < 10)
    return (
        lineitem.join(small_parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q22_global_scalar",
    oracle="""
    SELECT substr(c_name, 10, 2) AS cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY substr(c_name, 10, 2)
    """,
    tags=("join", "agg", "subquery"),
)
def q22_global_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average,
    broadcast as a 1-row cross join) + anti join."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy(
        F.substring("c_name", 10, 2).alias("cntrycode")
    ).agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@query(
    "p1_fhirize_projection",
    oracle="""
    SELECT c_custkey,
           concat('{"resourceType":"Patient"',
                  ',"id":"customer-', CAST(c_custkey AS VARCHAR), '"',
                  ',"identifier":[{"use":"official","system":"https://example.org/tpch","value":"',
                  c_name, '"}]',
                  CASE WHEN c_acctbal >= 0
                       THEN concat(',"extension":[{"url":"https://example.org/acctbal","valueString":"',
                                   CAST(round(c_acctbal, 2) AS VARCHAR), '"}]')
                       ELSE '' END,
                  '}') AS doc
    FROM customer
    """,
    tags=("projection", "nested"),
)
def p1_fhirize_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (the reference's core operator) as an inventory query: flat row →
    nested document (identifier[], conditional extension[]) → one to_json.
    The oracle string-builds the identical JSON — pinning field order,
    null-dropping, and conditional inclusion."""
    customer = load_tables(spark, sf_dir, "customer")
    doc = F.struct(
        F.lit("Patient").alias("resourceType"),
        F.concat(F.lit("customer-"), F.col("c_custkey").cast("string")).alias("id"),
        F.array(
            F.struct(
                F.lit("official").alias("use"),
                F.lit("https://example.org/tpch").alias("system"),
                F.col("c_name").alias("value"),
            )
        ).alias("identifier"),
        F.when(
            F.col("c_acctbal") >= 0,
            F.array(
                F.struct(
                    F.lit("https://example.org/acctbal").alias("url"),
                    F.round(F.col("c_acctbal"), 2).cast("string").alias("valueString"),
                )
            ),
        ).alias("extension"),
    )
    return customer.select(
        "c_custkey", F.to_json(doc, {"ignoreNullFields": "true"}).alias("doc")
    )
