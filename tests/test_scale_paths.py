"""Scale-path mechanics: salted skew joins and bucketed co-located joins —
the levers SURVEY.md §4.4 promises for 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.joins import salted_join


def test_salted_join_correctness(spark):
    """Salting must not change join results — same rows as a plain join,
    even with a pathologically hot key."""
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)], "k long, payload long"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (4, "miss")], "k long, v string")
    plain = set(
        (r["k"], r["payload"], r["v"])
        for r in left.join(right, "k").collect()
    )
    salted = set(
        (r["k"], r["payload"], r["v"])
        for r in salted_join(left, right, "k").collect()
    )
    assert salted == plain
    assert len(salted) == 501


def test_salted_left_join(spark):
    left = spark.createDataFrame([(1, "a"), (9, "b")], "k long, tag string")
    right = spark.createDataFrame([(1, "x")], "k long, v string")
    rows = {(r["tag"], r["v"]) for r in salted_join(left, right, "k", how="left").collect()}
    assert rows == {("a", "x"), ("b", None)}


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketed tables co-locate join keys at WRITE time: the later join
    plan must contain no shuffle Exchange on either side."""
    from fhir_etl_spark.session import load_tables

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders, customer = load_tables(
            spark, "/root/testdata/sf0.001", "orders", "customer"
        )
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        (
            orders.write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("bkt_orders")
        )
        (
            customer.withColumnRenamed("c_custkey", "o_custkey")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("bkt_customer")
        )
        joined = spark.table("bkt_orders").join(spark.table("bkt_customer"), "o_custkey")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        assert joined.count() == 1500
        import re

        assert not re.search(r"[+:]- Exchange ", plan), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")