"""Bucketed tables: the join over two same-bucketed tables must plan with
ZERO shuffle exchanges — that is the entire point of paying the bucketed
write once at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.session import load_tables
from fhir_etl_spark.sinks.bucketed import bucketed_join, write_bucketed

ORDERS_T = "t_bucketed_orders"
LINEITEM_T = "t_bucketed_lineitem"


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        ORDERS_T, "orderkey", num_buckets=8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        LINEITEM_T, "orderkey", num_buckets=8,
    )
    yield ORDERS_T, LINEITEM_T
    spark.sql(f"DROP TABLE IF EXISTS {ORDERS_T}")
    spark.sql(f"DROP TABLE IF EXISTS {LINEITEM_T}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "orderkey")
    # disable auto-broadcast so the plan genuinely exercises the bucketed
    # sort-merge path (at real scale neither fact side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # correctness: same rows as the plain parquet join
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == expected


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """Point lookups on the bucket key scan ONE bucket, not all 8
    (SelectedBucketsCount in the scan node)."""
    left, _ = bucketed_tables
    # autoBucketedScan drops the bucket layout when it thinks the query
    # doesn't need it (pure filter); force it on to exercise pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(left).filter(F.col("orderkey") == 7)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
