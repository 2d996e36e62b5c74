"""Benchmark decontamination: flag corpus documents sharing k-gram shingles
with an evaluation/benchmark set.

The standard pre-training hygiene step (remove eval-set leakage before
training). Scale shape: the benchmark side is SMALL (eval suites are
10⁴–10⁶ shingles) and is broadcast — the 100 TB corpus is filtered
map-side by a broadcast semi/inner join on the shingle, so the corpus is
never shuffled; only the (tiny) surviving hit set aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import doc_shingles


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-document count of distinct k-gram shingles shared with
    the benchmark set → (id_col, n_hits), n_hits ≥ 1.

    Join strategy: benchmark shingles are deduplicated then broadcast;
    the corpus shingle stream inner-joins map-side (no corpus shuffle),
    and only matching (doc, shingle) rows reach the count aggregation.
    """
    corpus_sh = doc_shingles(corpus, id_col=id_col, text_col=text_col, k=k)
    bench_sh = (
        doc_shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
        .select("shingle")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))  # doc_shingles is per-doc distinct
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents with ≥ ``min_hits`` benchmark shingles
    (anti join against the flagged id set)."""
    flagged = contamination_hits(
        corpus, benchmark, k=k, id_col=id_col, text_col=text_col
    ).filter(F.col("n_hits") >= min_hits)
    return corpus.join(F.broadcast(flagged.select(id_col)), id_col, "left_anti")


def bloom_bitset(
    shingles: DataFrame,
    n_bits: int = 1 << 22,
    n_hashes: int = 3,
    col: str = "shingle",
) -> DataFrame:
    """Distinct values of ``col`` → a ONE-ROW DataFrame holding a Bloom
    filter as a DENSE ``bits: array<long>`` (n_bits/64 words) plus its
    parameters. Bit setting is JVM-side (k positions per value via
    seeded xxhash64, bit-OR folded per word); the occupied words — at
    most n_bits/8 bytes, 512 KiB at the default — are then merged into
    the dense array through ONE bounded driver collect, exactly how
    every engine's Bloom build works (Spark's own sketch aggregates
    partials to the driver before broadcasting). Dense matters: probing
    is ``element_at(array, i)`` = O(1) indexed load per hash, whereas a
    map<word,bits> probe is a LINEAR scan of the map entries per lookup
    (Spark MapData has no hash index) — measured 3× slower than the
    exact join it was supposed to beat at 65k occupied words.

    Sizing: n_bits = 2²² (512 KiB) with k = 3 holds a ~1%-FP filter for
    ~300k members; scale n_bits with the benchmark, not the corpus.
    """
    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(seed), F.col(col)), F.lit(n_bits))
            for seed in range(n_hashes)
        ]
    )
    occupied = (
        shingles.select(F.col(col)).distinct()
        .select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # call_function: the Python shiftleft wrapper takes only a
            # literal int shift; the SQL function accepts an expression
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()  # bounded: ≤ n_bits/64 rows of (int, long)
    )
    dense = [0] * (n_bits // 64)
    for row in occupied:
        dense[row["word"]] = row["bits"]
    spark = shingles.sparkSession
    return spark.createDataFrame(
        [(n_bits, n_hashes, dense)],
        "n_bits int, n_hashes int, bits array<long>",
    )


def _bloom_maybe_contains(bloom_bits: Column, n_bits: int, n_hashes: int, col: Column) -> Column:
    """Boolean Column: all k bloom bits set for ``col`` (i.e. possibly a
    member; definitely-not when false)."""
    cond = F.lit(True)
    for seed in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(seed), col), F.lit(n_bits))
        word = (pos / 64).cast("int") + 1  # element_at on arrays is 1-based
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (F.element_at(bloom_bits, word).bitwiseAND(bit) != 0)
    return cond


def bloom_contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    n_bits: int = 1 << 22,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``contamination_hits`` semantics via a Bloom prefilter — the shape
    that survives benchmark sets too large to broadcast as raw shingle
    strings.

    Plan: (1) build the benchmark Bloom bitset (tiny: ≤ n_bits/8 bytes,
    here ≤ 512 KiB) and broadcast-cross-join it onto the corpus shingle
    stream; (2) the map-side codegen membership test discards every
    shingle the benchmark definitely doesn't contain — at 100 TB this is
    the step that turns the exact-verify join's corpus side from
    everything into (true hits + the ~1% false-positive trickle);
    (3) the survivors verify EXACTLY against the distinct benchmark
    shingles, so false positives drop out and the result is bit-identical
    to the exact operator (pinned by the shared oracle). The raw-string
    broadcast in `contamination_hits` moves |bench shingles| × avg-len
    bytes to every executor; the bitset moves ≤ 512 KiB regardless.
    """
    corpus_sh = doc_shingles(corpus, id_col=id_col, text_col=text_col, k=k)
    # checkpoint: the bench shingle set feeds BOTH the bloom build (an
    # eager job) and the verify join — without pinning it the bench
    # shingling pipeline executes twice
    bench_sh = (
        doc_shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
        .select("shingle")
        .distinct()
        .localCheckpoint()
    )
    bloom = bloom_bitset(bench_sh, n_bits=n_bits, n_hashes=n_hashes)
    candidates = (
        corpus_sh.join(F.broadcast(bloom))
        .where(
            _bloom_maybe_contains(
                F.col("bits"), n_bits, n_hashes, F.col("shingle")
            )
        )
        .select(id_col, "shingle")
    )
    return (
        candidates.join(bench_sh, "shingle")  # exact verify: FPs drop out
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    min_hits: int = 1,
    n_bits: int = 1 << 22,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents with ≥ ``min_hits`` benchmark shingles,
    flagged via the Bloom-prefiltered path (exact result — the verify
    join removes Bloom false positives)."""
    flagged = bloom_contamination_hits(
        corpus, benchmark, k=k, n_bits=n_bits, n_hashes=n_hashes,
        id_col=id_col, text_col=text_col,
    ).filter(F.col("n_hits") >= min_hits)
    return corpus.join(F.broadcast(flagged.select(id_col)), id_col, "left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-BENCHMARK-document contamination report (the GPT-3 Appendix-C
    table; Brown 2020): for each eval document, how much of it leaks
    into the training corpus — ``(doc_id, n_shingles, n_hit_shingles,
    overlap_pct_milli, n_contaminating_docs)``. This is the reporting
    twin of :func:`contamination_hits` (which flags CORPUS docs): eval
    owners read this table to decide which benchmark rows to discount.

    overlap_pct_milli = (1000 · n_hit_shingles) DIV n_shingles — BIGINT
    integer division, cross-engine exact. Benchmark docs with zero
    corpus overlap still appear (overlap 0); docs shorter than k tokens
    have no shingles and are absent on both engines.

    Scale shape: same as contamination_hits — the benchmark shingle set
    (small by definition) broadcasts into the corpus shingle stream, so
    the 100 TB side never shuffles; only matched (bench_doc, shingle,
    corpus_doc) rows reach the two-distinct aggregation (Spark expands
    2× for the dual count-distinct, over the tiny matched set)."""
    corpus_sh = doc_shingles(corpus, id_col=id_col, text_col=text_col, k=k)
    bench_sh = doc_shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
    totals = bench_sh.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    matched = corpus_sh.select(
        F.col(id_col).alias("_corpus_doc"), "shingle"
    ).join(F.broadcast(bench_sh), "shingle")
    hits = matched.groupBy(id_col).agg(
        F.count_distinct("shingle").cast("long").alias("n_hit_shingles"),
        F.count_distinct("_corpus_doc").cast("long").alias(
            "n_contaminating_docs"
        ),
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_hit_shingles", F.lit(0).cast("long")).alias(
                "n_hit_shingles"
            ),
            F.expr(
                "(1000 * coalesce(n_hit_shingles, 0)) DIV n_shingles"
            ).alias("overlap_pct_milli"),
            F.coalesce("n_contaminating_docs", F.lit(0).cast("long")).alias(
                "n_contaminating_docs"
            ),
        )
    )
