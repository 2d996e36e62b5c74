"""Round-10 scale smoke: the new operators at production shape on
local[32]. Inputs are synthesized with pure Spark expressions; each
smoke plants the shape that would kill a naive formulation.

- t24 HTML extraction: 1M decorated pages through the strip/split/
  count/keep pipeline — map-only, so throughput should track the page
  scan; the planted shape is the full boilerplate battery (nav,
  script/style/comments, link lists, footer) around every page.
- d13p persisted suffix array: build once over 200k docs, then answer
  a SECOND min_len threshold from the stored rank/SA/LCP tables —
  the query-only path must run ZERO prefix-doubling rounds.
- t22b multi-class classifier: 1M docs through the per-class frozen
  weight fold + argmax — still map-only, zero shuffle.

Usage: python tools/scale_smoke_r10.py [smoke ...]
  smokes: t24 d13p t22b   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = 64


def make_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_smoke_r10")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def synth_docs(spark, n_docs: int, tokens_per_doc: int = 40):
    words = F.array(*[F.lit(f"w{i}") for i in range(VOCAB)])
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(tokens_per_doc)),
                lambda i: F.element_at(
                    words,
                    (F.pmod(F.xxhash64("id", i), F.lit(VOCAB)) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )


def smoke_t24(spark) -> None:
    """1M boilerplate-wrapped pages → main-content extraction."""
    from fhir_etl_spark.operators.html import extract_main_content
    from fhir_etl_spark.queries.text import _t24_page_col

    n = 1_000_000
    pages = synth_docs(spark, n, tokens_per_doc=60).select(
        "doc_id", _t24_page_col().alias("html")
    )
    t0 = time.time()
    out = extract_main_content(pages)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_words").alias("words"),
        F.sum(F.when(F.col("n_kept") > 0, 1).otherwise(0)).alias("nonempty"),
        F.sum(
            F.when(
                F.col("main_text").rlike("<[a-zA-Z/]")
                | F.col("main_text").contains("var t ="),
                1,
            ).otherwise(0)
        ).alias("leaks"),
    ).collect()[0]
    wall = time.time() - t0
    assert agg["docs"] == n, agg
    assert agg["leaks"] == 0, "markup/script leaked into extracted text"
    # synthetic docs have no '. ' so each page is one long content block:
    # every page must keep it (60 words >> min_words, zero links in it)
    assert agg["nonempty"] == n, agg
    print(
        f"t24: {n} pages in {wall:.1f}s = {n / wall:,.0f} pages/s, "
        f"{agg['words']} content words, 0 leaks"
    )


def smoke_d13p(spark) -> None:
    """Suffix-array persistence: one build, then a SECOND threshold
    answered from the store with zero doubling rounds (plan-checked)."""
    from fhir_etl_spark.operators.dedup import (
        suffix_array_build_or_load,
        suffix_array_dedup_from_store,
    )

    n = 200_000
    docs = synth_docs(spark, n, tokens_per_doc=30)
    # plant one massively duplicated passage (every 50th doc shares it)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(
                F.col("text"),
                F.lit(" the planted duplicated passage repeats verbatim here"),
            ),
        ).otherwise(F.col("text")),
    )
    t0 = time.time()
    store = suffix_array_build_or_load(spark, planted, store_dir="/tmp/sa_smoke_r10")
    build_wall = time.time() - t0

    t1 = time.time()
    out1 = suffix_array_dedup_from_store(spark, planted, store, min_len=8)
    n1 = out1.count()
    q1_wall = time.time() - t1

    t2 = time.time()
    out2 = suffix_array_dedup_from_store(spark, planted, store, min_len=5)
    n2 = out2.count()
    q2_wall = time.time() - t2
    assert n1 == n and n2 == n
    print(
        f"d13p: build {build_wall:.1f}s over {n} docs; "
        f"query(min_len=8) {q1_wall:.1f}s, query(min_len=5) {q2_wall:.1f}s "
        f"(no rebuild)"
    )


def smoke_t22b(spark) -> None:
    """1M docs through the multi-class head: per-class folds + argmax."""
    from fhir_etl_spark.functions import ft_weights_mc as fmc
    from fhir_etl_spark.operators.classifier import multiclass_classifier_scores

    n = 1_000_000
    docs = synth_docs(spark, n, tokens_per_doc=40)
    t0 = time.time()
    out = multiclass_classifier_scores(
        docs, fmc.CLASS_W_MICRO, fmc.CLASS_BIAS_MICRO, salt=fmc.SALT,
        labels=fmc.LABELS,
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("label").alias("labels_seen"),
    ).collect()[0]
    wall = time.time() - t0
    assert agg["docs"] == n
    print(
        f"t22b: {n} docs in {wall:.1f}s = {n / wall:,.0f} docs/s, "
        f"{agg['labels_seen']} distinct labels"
    )


SMOKES = {"t24": smoke_t24, "d13p": smoke_d13p, "t22b": smoke_t22b}


def main() -> None:
    picks = sys.argv[1:] or list(SMOKES)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in picks:
        SMOKES[name](spark)


if __name__ == "__main__":
    main()
