"""Round-7 scale smoke: the new SemDeDup operator and the xlsx source at
100k-row scale on local[32], one timing line per operator. Inputs are
synthesized with pure Spark expressions (no driver-side data), and each
smoke deliberately plants the degenerate shape that kills a naive
formulation (an 11k-member near-identical cluster for semdedup; a
many-small-files corpus for xlsx).

Usage: python tools/scale_smoke_r07.py [smoke ...]
  smokes: v8 s15   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r07")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def smoke_v8(spark):
    """100k 64-dim vectors: 90k spread over 1000 pseudo-random base
    directions (plus per-vector noise), 10k NEAR-IDENTICAL (the
    degenerate cluster a naive all-pairs semdedup dies on — 50M pairs
    from that cluster alone). k=100 keeps average clusters ~1k (the
    sqrt-n regime the paper runs), and max_cluster_size=2000 must cap
    the degenerate cluster loudly while the planted base-direction
    near-dups still collapse."""
    from fhir_etl_spark.operators.similarity import semdedup_keep

    n, dim, n_base = 100_000, 64, 1000
    dims = F.array(*[F.lit(d) for d in range(dim)])
    # base direction per vector (id % n_base), unit-ish pseudo-random
    # components in [-1, 1] from a seeded hash; noise at 3% amplitude
    base = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.col("bid"), d, F.lit(7)), F.lit(2001)) - 1000
        ) / 1000.0,
    )
    noise = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.col("id"), d, F.lit(11)), F.lit(2001)) - 1000
        ) / 1000.0 * 0.03,
    )
    vecs = (
        spark.range(n)
        .withColumn(
            "bid",
            # ids >= 90k all share base 0 with near-zero extra noise: the
            # degenerate near-identical block
            F.when(F.col("id") >= 90_000, F.lit(0)).otherwise(
                F.col("id") % n_base
            ),
        )
        .select(
            F.col("id").alias("vec_id"),
            F.zip_with(base, noise, lambda b, z: b + z).alias("embedding"),
        )
    )
    t0 = time.perf_counter()
    out = semdedup_keep(
        vecs, k=100, n_iterations=2, threshold=0.97,
        max_cluster_size=2000, init="hash_sample",
    )
    stats = out.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    assert stats["rows"] == n, stats
    # the 90 near-dup copies per base direction must collapse hard; the
    # capped degenerate block keeps its over-cap tail un-deduped
    assert stats["kept"] < n * 0.35, stats
    print(
        f"v8 semdedup: {n} vecs k=100 -> kept {stats['kept']} "
        f"({100 * stats['kept'] / n:.1f}%) in {dt:.1f}s"
    )


def smoke_s15(spark):
    """100k records as 32 xlsx workbooks (~3.1k rows each) written
    distributed, read back through the partition-per-file DataSource and
    the Catalyst record pivot — the many-small-dictionaries corpus shape
    the source is built for."""
    import os
    import shutil

    from fhir_etl_spark.sources.xlsx import XlsxDataSource, xlsx_records

    out_dir = "/tmp/fhir_etl_spark_xlsx_smoke"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    n, n_files = 100_000, 32

    def write_group(key, pdf):
        import pandas as pd

        from fhir_etl_spark.sources.xlsx import write_xlsx

        fid = int(key[0])
        rows = [["ID", "NAME", "VAL"]]
        rows += [
            [int(i), f"name-{int(i)}", float(i) / 7.0]
            for i in sorted(pdf["id"])
        ]
        with open(f"{out_dir}/f{fid:03d}.xlsx", "wb") as f:
            f.write(write_xlsx({"data": rows}))
        return pd.DataFrame({"fid": [fid], "n": [len(rows) - 1]})

    t0 = time.perf_counter()
    (
        spark.range(n)
        .withColumn("fid", F.col("id") % n_files)
        .groupBy("fid")
        .applyInPandas(write_group, "fid long, n long")
        .collect()
    )
    t_write = time.perf_counter() - t0
    try:
        spark.dataSource.register(XlsxDataSource)
    except Exception:  # noqa: BLE001
        pass
    paths = ",".join(f"{out_dir}/f{i:03d}.xlsx" for i in range(n_files))
    t0 = time.perf_counter()
    cells = spark.read.format("xlsx").option("paths", paths).load()
    recs = xlsx_records(cells, header_row=1)
    stats = recs.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("fields")["ID"].cast("long")).alias("id_sum"),
    ).collect()[0]
    t_read = time.perf_counter() - t0
    assert stats["rows"] == n, stats
    assert stats["id_sum"] == n * (n - 1) // 2, stats
    print(
        f"s15 xlsx: wrote {n_files} workbooks ({n} rows) in {t_write:.1f}s, "
        f"read+pivot in {t_read:.1f}s ({n / t_read:,.0f} rows/s)"
    )


def main() -> None:
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    which = set(sys.argv[1:]) or {"v8", "s15"}
    if "v8" in which:
        smoke_v8(spark)
    if "s15" in which:
        smoke_s15(spark)
    spark.stop()


if __name__ == "__main__":
    main()
