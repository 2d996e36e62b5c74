"""Multi-dimensional data layout: Z-order (Morton) clustering for scan
pruning.

The reference has no storage-layout story at all (it writes NDJSON in
input order, `utils.py:104-127`); at 100 TB the dominant cost of every
query is the scan, and the standard lever is clustering files so that
parquet footer min/max stats prune row groups on MORE THAN ONE predicate
column. Sorting by a single column gives perfect pruning on that column
and none on the others; interleaving the bits of several columns (the
Z-order / Morton curve) gives good pruning on each — this is what Delta
Lake's `OPTIMIZE ZORDER BY` and ClickHouse's multi-dim indexes do.

Everything here is pure Catalyst arithmetic (whole-stage codegen; no UDF,
no Python in the hot path):

1. per-column min/max in ONE tiny aggregate, broadcast back (no collect
   in the plan-building path, no second scan of wide columns);
2. integer scaling of each column into ``2**bits`` buckets with floor
   ("div") division — integer-exact, so a DuckDB oracle can reproduce the
   values bit-for-bit;
3. bit interleave via shiftleft/shiftright/AND;
4. ``repartitionByRange`` on the z-value + ``sortWithinPartitions`` so
   each output file covers a compact hyper-rectangle of the key space.

At cluster scale the range exchange samples the z-value distribution
(Spark's RangePartitioner) — no global sort, no single-partition stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Add a ``_zvalue`` column interleaving ``bits`` bits of each col.

    Columns must be numeric (cast to bigint internally). NULLs scale to
    bucket 0 (they sort first, same as parquet stats treat them).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    if bits * n > 63:
        # bit 63 is the BIGINT sign bit: interleaving into it flips the
        # sign and silently reorders the range partitioning; higher bits
        # would be dropped entirely
        raise ValueError(
            f"bits * len(cols) = {bits * n} exceeds 63: the interleaved key "
            f"must fit a signed BIGINT — lower bits (e.g. {63 // n}) or drop columns"
        )
    buckets = 1 << bits

    stats = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"_zmin_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("long")).alias(f"_zmax_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(stats))

    # integer bucket per column: ((x - min) * 2^bits) div (max - min + 1)
    scaled_names = []
    for i, c in enumerate(cols):
        name = f"_zs_{i}"
        scaled_names.append(name)
        out = out.withColumn(
            name,
            F.coalesce(
                F.expr(
                    f"((cast(`{c}` as bigint) - _zmin_{i}) * {buckets})"
                    f" div (_zmax_{i} - _zmin_{i} + 1)"
                ),
                F.lit(0),
            ),
        )

    z: Column = F.lit(0).cast("long")
    for bit in range(bits):
        for j, name in enumerate(scaled_names):
            z = z + F.shiftleft(
                F.shiftright(F.col(name), bit).bitwiseAND(F.lit(1)), bit * n + j
            )

    drop = [f"_zmin_{i}" for i in range(n)] + [f"_zmax_{i}" for i in range(n)]
    return out.withColumn("_zvalue", z.cast("long")).drop(*drop, *scaled_names)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-order curve of ``cols``.

    Returns a DataFrame whose partitioning/order is ready to write: one
    output file per range of the curve, each covering a compact region in
    every clustered dimension — so parquet min/max stats prune scans on
    ANY of the clustered columns, not just a leading sort key.
    """
    keyed = zorder_key(df, cols, bits=bits)
    if num_partitions is not None:
        keyed = keyed.repartitionByRange(num_partitions, "_zvalue")
    else:
        keyed = keyed.repartitionByRange("_zvalue")
    return keyed.sortWithinPartitions("_zvalue").drop("_zvalue")
