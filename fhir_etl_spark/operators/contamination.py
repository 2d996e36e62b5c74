"""Benchmark decontamination: flag corpus documents sharing k-gram shingles
with an evaluation/benchmark set.

The standard pre-training hygiene step (remove eval-set leakage before
training). Scale shape: the benchmark side is SMALL (eval suites are
10⁴–10⁶ shingles) and is broadcast — the 100 TB corpus is filtered
map-side by a broadcast semi/inner join on the shingle, so the corpus is
never shuffled; only the (tiny) surviving hit set aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
