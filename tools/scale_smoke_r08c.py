"""Round-8c scale smoke: product-quantization ANN (v11) at 1M×64 on
local[32] — the tier whose whole reason to exist is this scale. Verifies
(a) codebook training + encoding completes with the corpus never
shuffling vectors for scoring (codebooks broadcast), (b) the ADC scan is
map-only over 4-byte codes + per-query LUTs, and (c) recall sanity on a
planted structure: each probe's own vector must hold ADC rank 1 (the
self-distance is provably the corpus minimum — see the v11 test).

Also smokes w10 Holt at 10M rows (the w9 shape with a 2-double state)
and the s17 Arrow IPC roundtrip at 1M docs.

Usage: python tools/scale_smoke_r08c.py [smoke ...]
  smokes: pq holt ipc   (default: all)
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
        .appName("scale_smoke_r08c")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def _synth_embeddings(spark, n: int, dim: int):
    """n pseudo-random unit-ish vectors, pure Spark expressions (no
    Python): component d of row i = (xxhash64(i, d) mod 2001 - 1000)/1000."""
    cols = [
        ((F.pmod(F.xxhash64("id", F.lit(d)), F.lit(2001)) - 1000) / 1000.0)
        for d in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def smoke_pq(spark):
    from fhir_etl_spark.operators.similarity import pq_adc_topk, pq_train_encode

    n, dim = 1_000_000, 64
    emb = _synth_embeddings(spark, n, dim).localCheckpoint()
    t0 = time.perf_counter()
    codes, codebook = pq_train_encode(emb, dim=dim, m=4, sub_k=16, n_iterations=2)
    codes = codes.localCheckpoint()  # encode once; the scan reuses it
    t_train = time.perf_counter() - t0

    queries = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t1 = time.perf_counter()
    top = pq_adc_topk(codes, codebook, queries, k=10, m=4, sub_len=16).collect()
    t_scan = time.perf_counter() - t1

    by_q = {}
    for r in sorted(top, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rows in by_q.items():
        # self-distance is the provable ADC minimum; ties break on id, and
        # a planted hash collision could tie — accept self in the top ranks
        # with the minimal adc value
        self_rows = [r for r in rows if r["vec_id"] == qid]
        assert self_rows and self_rows[0]["adc_micro"] == rows[0]["adc_micro"], (
            f"query {qid}: self not at the ADC minimum"
        )
    print(
        f"pq: train+encode {n}x{dim} in {t_train:.1f}s, "
        f"ADC scan 3 queries in {t_scan:.1f}s, self-match ok"
    )


def smoke_holt(spark):
    from fhir_etl_spark.operators.timeseries import holt_smoothing

    n, users = 10_000_000, 100_000
    events = spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        (F.col("id") / users).cast("long").alias("t"),
        (
            (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(2001)) - 1000) / 100.0
        ).alias("value"),
    )
    t0 = time.perf_counter()
    out = holt_smoothing(events, ["user_id"], ["t"], "value", alpha=0.25, beta=0.5)
    total = out.count()
    got = sorted(
        out.filter(F.col("user_id") == 7).collect(), key=lambda r: r["t"]
    )
    dt = time.perf_counter() - t0
    assert total == n
    # local replay of user 7 — identical IEEE sequence, exact equality
    lvl = trd = None
    for r in got:
        if lvl is None:
            lvl, trd = r["value"], 0.0
        else:
            new_l = 0.25 * r["value"] + 0.75 * (lvl + trd)
            trd = 0.5 * (new_l - lvl) + 0.5 * trd
            lvl = new_l
        assert r["level"] == lvl and r["trend"] == trd
    print(f"holt: {n} rows / {users} keys in {dt:.1f}s, exact replay ok")


def smoke_ipc(spark):
    import shutil

    from fhir_etl_spark.sources.arrow_ipc import read_arrow_ipc

    n = 1_000_000
    out_dir = f"/tmp/fhir_etl_spark_ipc_smoke-{os.getpid()}"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("synthetic body "), F.col("id")).alias("text"),
    )
    t0 = time.perf_counter()
    # write via 32 per-partition IPC files (pandas writer path is the
    # fixture protocol; here we exercise the READ at scale, so the write
    # goes through parquet→arrow staging driver-free)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fhir_etl_spark.sources.arrow_ipc import write_ipc_file

    stage = f"{out_dir}.parquet"
    docs.repartition(32).write.mode("overwrite").parquet(stage)
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet"):
            write_ipc_file(f"{out_dir}/shard-{i:03d}.arrow", pq.read_table(f"{stage}/{f}"))
    back = read_arrow_ipc(spark, f"{out_dir}/*.arrow", "doc_id bigint, text string")
    cnt = back.count()
    s = back.agg(F.sum("doc_id")).first()[0]
    dt = time.perf_counter() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    assert cnt == n and s == n * (n - 1) // 2
    print(f"ipc: {n} docs round-tripped in {dt:.1f}s (incl. staging), sums ok")


def smoke_ivfpq(spark):
    """IVF-PQ at 1M×64: build (coarse assign + residual checkpoint +
    codebook training + encode) and a 2-of-8-probe ADC search — the
    probed scan should touch ~25% of the corpus's codes."""
    from pyspark.sql import functions as F  # noqa: F811

    from fhir_etl_spark.operators.similarity import ivf_pq_build, ivf_pq_search

    n, dim = 1_000_000, 64
    emb = _synth_embeddings(spark, n, dim).localCheckpoint()
    t0 = time.perf_counter()
    codes, coarse, codebook = ivf_pq_build(
        emb, dim=dim, n_list=8, m=4, sub_k=16, n_iterations=2
    )
    codes = codes.localCheckpoint()
    t_build = time.perf_counter() - t0
    queries = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t1 = time.perf_counter()
    top = ivf_pq_search(
        codes, coarse, codebook, queries, k=10, n_probe=2, m=4, sub_len=16
    ).collect()
    t_scan = time.perf_counter() - t1
    by_q = {}
    for r in sorted(top, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rows in by_q.items():
        self_rows = [r for r in rows if r["vec_id"] == qid]
        assert self_rows and self_rows[0]["adc_micro"] == rows[0]["adc_micro"]
    print(
        f"ivfpq: build {n}x{dim} (8 lists) in {t_build:.1f}s, "
        f"2-probe ADC scan in {t_scan:.1f}s, self-match ok"
    )


def smoke_colloc(spark):
    """Collocation lift over 1M synthetic docs (~12 tokens each, zipf-ish
    vocab from hash buckets, plus a PLANTED pair 'alpha beta' co-occurring
    in every 50th doc): the per-doc token cap bounds pair fan-out, the
    doc-frequency joins shuffle on the token key, and the planted pair
    must win rank 1 by lift."""
    from pyspark.sql import functions as F  # noqa: F811

    from fhir_etl_spark.operators.text import collocation_lift

    n = 1_000_000
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64("id", F.lit(j)), F.lit(500 + 37 * j)).cast("string"),
        )
        for j in range(12)
    ]
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 50 == 0,
            F.concat_ws(" ", F.lit("alpha"), F.lit("beta"), *words),
        ).otherwise(F.concat_ws(" ", *words)).alias("text"),
    )
    t0 = time.perf_counter()
    top = collocation_lift(docs, min_pair_docs=100, top_k=20).collect()
    dt = time.perf_counter() - t0
    best = min(top, key=lambda r: r["rank"])
    assert (best["token_a"], best["token_b"]) == ("alpha", "beta"), best
    assert best["pair_docs"] == n // 50
    print(
        f"colloc: {n} docs mined in {dt:.1f}s, planted pair at rank 1 "
        f"(lift_micro={best['lift_micro']})"
    )


def smoke_binary(spark):
    """1-bit ANN at 1M×64: sign packing + Hamming scan — the cheapest
    rung of the quantization ladder should be the fastest scan here."""
    from pyspark.sql import functions as F  # noqa: F811

    from fhir_etl_spark.operators.similarity import binary_hamming_topk

    n, dim = 1_000_000, 64
    emb = _synth_embeddings(spark, n, dim).localCheckpoint()
    queries = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.perf_counter()
    top = binary_hamming_topk(emb, queries, k=10, dim=dim).collect()
    dt = time.perf_counter() - t0
    by_q = {}
    for r in sorted(top, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rows in by_q.items():
        self_rows = [r for r in rows if r["vec_id"] == qid]
        assert self_rows and self_rows[0]["hamming"] == 0  # self = 0 bits
    print(f"binary: {n}x{dim} Hamming top-10 in {dt:.1f}s, self at 0 bits")


SMOKES = {
    "pq": smoke_pq,
    "holt": smoke_holt,
    "ipc": smoke_ipc,
    "ivfpq": smoke_ivfpq,
    "colloc": smoke_colloc,
    "binary": smoke_binary,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for nm in names:
        SMOKES[nm](spark)
