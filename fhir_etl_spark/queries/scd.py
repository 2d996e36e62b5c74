"""SCD2 merge as a driver-gate query: one merge application over
deterministically derived history/changes, oracled by an independent SQL
formulation of the same contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables


@query(
    "scd2_merge_batch",
    oracle="""
    WITH history AS (
      SELECT c_custkey AS key, c_acctbal AS bal,
             TIMESTAMP '2020-01-01' AS valid_from,
             TIMESTAMP '9999-12-31' AS valid_to,
             true AS is_current
      FROM customer
    ), changes AS (
      -- every third customer gets a balance bump; two brand-new keys use
      -- values above any SF's custkey range (9001 collided at sf0.1)
      SELECT c_custkey AS key, round(c_acctbal + 100, 2) AS bal,
             TIMESTAMP '2021-06-01' AS ts
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey AS key, c_acctbal AS bal, TIMESTAMP '2021-06-01' AS ts
      FROM customer WHERE c_custkey % 3 = 1   -- no-op changes
      UNION ALL
      SELECT 10000000001, 50.0, TIMESTAMP '2021-06-01'
      UNION ALL SELECT 10000000002, 60.0, TIMESTAMP '2021-06-01'
    )
    SELECT h.key, h.bal,
           CAST(c.ts AS VARCHAR) AS valid_to_str, false AS is_current
    FROM history h JOIN changes c ON h.key = c.key AND h.bal <> c.bal
    UNION ALL
    SELECT h.key, h.bal, '9999-12-31 00:00:00', true
    FROM history h LEFT JOIN changes c ON h.key = c.key AND h.bal <> c.bal
    WHERE c.key IS NULL
    UNION ALL
    SELECT c.key, c.bal, '9999-12-31 00:00:00', true
    FROM changes c LEFT JOIN history h ON h.key = c.key
    WHERE h.key IS NULL OR h.bal <> c.bal
    """,
    tags=("scd", "join"),
)
def scd2_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 merge application (operators/scd.scd2_merge) over a derived
    history + change batch; rows returned as (key, bal, valid_to, current)."""
    from fhir_etl_spark.operators.scd import scd2_init, scd2_merge

    customer = load_tables(spark, sf_dir, "customer")
    snapshot = customer.select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("bal"),
        F.lit("2020-01-01").cast("timestamp").alias("ts"),
    )
    history = scd2_init(snapshot, "key", "ts").drop("ts")

    bumped = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key"),
        F.round(F.col("c_acctbal") + 100, 2).alias("bal"),
        F.lit("2021-06-01").cast("timestamp").alias("ts"),
    )
    noops = customer.filter(F.col("c_custkey") % 3 == 1).select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("bal"),
        F.lit("2021-06-01").cast("timestamp").alias("ts"),
    )
    fresh = spark.createDataFrame(
        [(10_000_000_001, 50.0, "2021-06-01"), (10_000_000_002, 60.0, "2021-06-01")],
        "key long, bal double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    changes = bumped.unionByName(noops).unionByName(fresh)

    merged = scd2_merge(history, changes, "key", "ts", ["bal"])
    return merged.select(
        "key",
        "bal",
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to_str"),
        "is_current",
    )


@query(
    "u2_merge_into",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN c_custkey % 10 = 0 THEN c_custkey + 100000
                  ELSE c_custkey END AS c_custkey,
             c_name, c_nationkey,
             round(c_acctbal + 50.0, 2) AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 4 = 0
    ), merged AS (
      SELECT coalesce(s.c_custkey, t.c_custkey) AS k,
             t.c_custkey AS tk, s.c_custkey AS sk,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
             coalesce(s.c_mktsegment = 'MACHINERY', FALSE) AS del
      FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    )
    SELECT k AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM merged
    WHERE (tk IS NOT NULL AND NOT (sk IS NOT NULL AND del))
       OR (tk IS NULL AND sk IS NOT NULL AND NOT del)
    """,
    tags=("merge", "upsert"),
)
def u2_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic three-way MERGE INTO (operators/merge.py): an update set
    (acctbal bumped), an insert set (shifted keys), and a delete
    condition (MACHINERY segment) applied to customer in ONE full-outer
    join + CASE — the engine-native form of Delta's MERGE and the
    reference's create_or_extend (utils.py:101-135)."""
    from fhir_etl_spark.operators.merge import merge_into

    customer = load_tables(spark, sf_dir, "customer")
    src = customer.filter(F.col("c_custkey") % 4 == 0).select(
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_custkey") + 100000)
        .otherwise(F.col("c_custkey"))
        .alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 50.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    return merge_into(
        customer,
        src,
        on="c_custkey",
        delete_condition=F.col("c_mktsegment") == "MACHINERY",
    )


@query(
    "u3_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey % 11 <> 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           o.o_totalprice AS old_o_totalprice,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_totalprice AS new_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    """,
    tags=("merge", "cdc"),
)
def u3_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changeset recovery (operators/merge.snapshot_diff — the
    inverse of u2's MERGE): two orders snapshots differing by planted
    inserts (keys %11==0 absent from old), deletes (%7==0 absent from
    new) and updates (%3==0 price +100 — exact in binary, no
    cross-engine rounding ambiguity) → (key, op, old_*/new_* values),
    unchanged rows dropped. One full-outer join, null-safe per-column
    comparison; the oracle is the same join spelled in ANSI SQL."""
    from fhir_etl_spark.operators.merge import snapshot_diff

    orders = load_tables(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.filter(F.col("o_orderkey") % 11 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, on="o_orderkey")


@query(
    "u4_incremental_view",
    oracle="""
    WITH v1 AS (
      SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                  ELSE o_custkey END AS o_custkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) + 100
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS v
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(v), 2) AS DOUBLE) AS sum_value
    FROM v1 GROUP BY o_custkey
    """,
    tags=("merge", "cdc", "ivm"),
)
def u4_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance end-to-end (operators/ivm.py over
    operators/merge.snapshot_diff): a per-customer (count, sum) view
    built on the OLD snapshot is brought current by folding in the CDC
    changeset — inserts, deletes, value updates, AND group migrations
    (every 13th order moves to the next customer) — while the oracle
    RECOMPUTES the view from the new snapshot. Equality of the two is
    the IVM correctness statement; DECIMAL arithmetic makes the
    incremental sum bit-identical to the recomputed one (float addition
    order would differ). The new snapshot is never aggregated on the
    Spark side — only the changeset is."""
    from fhir_etl_spark.operators.ivm import build_agg_view, incremental_agg_update
    from fhir_etl_spark.operators.merge import snapshot_diff

    orders = load_tables(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    v0 = orders.filter(F.col("o_orderkey") % 11 != 0)
    v1 = (
        orders.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_custkey") + 1
            ).otherwise(F.col("o_custkey")),
        )
    )
    view0 = build_agg_view(v0, ["o_custkey"], "o_totalprice")
    changeset = snapshot_diff(
        v0, v1, on="o_orderkey", compare_cols=["o_custkey", "o_totalprice"]
    )
    updated = incremental_agg_update(
        view0, changeset, ["o_custkey"], "o_totalprice"
    )
    return updated.select(
        "o_custkey",
        "n_rows",
        F.round("sum_value", 2).cast("double").alias("sum_value"),
    )
