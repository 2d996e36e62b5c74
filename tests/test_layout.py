"""Z-order layout: value correctness (vs oracle, via test_oracle) and the
PHYSICAL claim — clustered files carry narrow per-file min/max ranges on
every clustered column, which is what makes parquet row-group pruning
work on 100 TB scans."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.layout import zorder_key, zorder_layout
from fhir_etl_spark.session import load_tables

N_FILES = 16


def _file_spans(path: str, column: str) -> list[int]:
    """Per-file (max - min) width of `column` from parquet footer stats."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append(hi - lo)
    return spans


def test_zvalue_bounds_and_cardinality(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")
    keyed = zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)
    stats = keyed.agg(
        F.count("*").alias("n"),
        F.min("_zvalue").alias("lo"),
        F.max("_zvalue").alias("hi"),
    ).first()
    assert stats["n"] == li.count()
    assert 0 <= stats["lo"] <= stats["hi"] < (1 << 16)  # 2 cols x 8 bits


def test_zorder_files_prune_on_both_dimensions(spark, sf_dir, tmp_path):
    """After zorder_layout, every file covers a narrow range of BOTH
    clustered columns; a hash-random layout covers ~the full domain in
    every file (no pruning possible). Footer stats are the proof."""
    li = load_tables(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    zdir = str(tmp_path / "zorder")
    rdir = str(tmp_path / "random")
    zorder_layout(li, ["l_partkey", "l_suppkey"], num_partitions=N_FILES).write.mode(
        "overwrite"
    ).parquet(zdir)
    li.repartition(N_FILES).write.mode("overwrite").parquet(rdir)

    domain = {
        c: spark.read.parquet(rdir).agg(F.max(c) - F.min(c)).first()[0]
        for c in ("l_partkey", "l_suppkey")
    }
    for col in ("l_partkey", "l_suppkey"):
        z_spans = _file_spans(zdir, col)
        r_spans = _file_spans(rdir, col)
        assert len(z_spans) >= 8, "expected multiple output files"
        # random layout: every file spans ~the whole domain
        assert min(r_spans) > 0.8 * domain[col]
        # zorder: the average file spans a small fraction of it (measured
        # 0.41 / 0.25 for partkey/suppkey at 16 files; 0.5 gives headroom)
        z_avg = sum(z_spans) / len(z_spans)
        assert z_avg < 0.5 * domain[col], (col, z_spans, domain[col])

    # layout changes bytes on disk, never rows
    assert (
        spark.read.parquet(zdir).count()
        == spark.read.parquet(rdir).count()
        == li.count()
    )


@pytest.mark.parametrize("bits", [4, 8])
def test_zorder_handles_constant_and_null_columns(spark, bits):
    df = spark.range(100).select(
        F.col("id"),
        F.lit(7).alias("const"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("holey"),
    )
    keyed = zorder_key(df, ["const", "holey"], bits=bits)
    got = keyed.agg(F.count("*"), F.min("_zvalue")).first()
    assert got[0] == 100 and got[1] >= 0


def test_zorder_rejects_curve_overflowing_bigint(spark):
    """bits × len(cols) > 63 would interleave into (or past) the BIGINT
    sign bit, silently corrupting the curve order — must raise instead."""
    df = spark.range(10).select(
        *[(F.col("id") * i).alias(f"c{i}") for i in range(8)]
    )
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, [f"c{i}" for i in range(8)], bits=8)  # 64 bits
    # 7 cols × 8 bits = 56 still fine
    assert zorder_key(df, [f"c{i}" for i in range(7)], bits=8).count() == 10


def test_dynamic_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + a filtered dim join plans a dynamic
    partition pruning subquery: only matching partitions are scanned —
    the partition-level sibling of the z-order row-group pruning."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.session import load_tables

    pdir = str(tmp_path / "orders_by_status")
    orders = load_tables(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(pdir)

    fact = spark.read.parquet(pdir)
    dim = spark.createDataFrame([("F", "finished")], "st string, label string")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    joined = fact.join(dim.filter(F.col("label") == "finished"),
                       fact.o_orderstatus == dim.st)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == orders.filter("o_orderstatus = 'F'").count()
