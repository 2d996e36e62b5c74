"""Round-11 scale smoke: the c5 capstone recipe stage by stage at
1M pages on local[32], with COUNT-EXACT assertions at every stage
boundary (VERDICT r10 #1's "1M-page smoke").

Corpus: 1M synthetic pages over the w-vocab (scale_smoke_r10.synth_docs)
decorated with the c5 page spec — so extraction faces real boilerplate,
line dedup faces the planted cookie/syndication lines, and each planted
structure has a CLOSED-FORM expected count:

- extract:   every page keeps exactly 3 blocks (cookie, source tag,
             content) — Σ n_kept == 3·n, no errors;
- line dedup: cookie (df=n) and tag (df=n/20 per source) are stripped
             everywhere; exactly the 1 content line per doc survives;
- fuzzy dedup: hash-random 48-token docs over a 64-word vocab share no
             3-gram at Jaccard ≥ 0.5 — survivors + (members − winners)
             == n, and the expected pair count is 0;
- decontaminate: the Bloom-prefiltered path must agree EXACTLY with the
             exact contamination join (two independent implementations
             of the same set);
- gate:      the c5 quality gate (t2 ≥ 0.5 AND ≥ 10 tokens) rejects
             48-token w-vocab salad exactly (0.4·0.48 + 0.3·1 + 0.3·0
             = 0.492 < 0.5 — no stopwords, no punctuation); the frozen
             t22 head's all-negative behavior on token salad is pinned
             as a separate regression check;
- pack/shard: run at the full 1M decon set so the 1M-scale stage cost
             is measured non-vacuously (the gate's selectivity on
             synthetic text would starve it): per-sequence budget
             respected, offsets consistent, positions contiguous,
             count preserved end to end.

WARC export/read-back is included (it is part of what the recipe
costs): 8 member-per-record-gzip files under /tmp.

Usage: python tools/scale_smoke_r11.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_smoke_r10 import make_spark

N_SOURCES = 20
# NOT scale_smoke_r10's 64-word vocab: with 64 words the benchmark
# slice's 3-gram shingles cover so much of the 64³ space that
# decontamination removes ~80% of the corpus by collision (measured at
# 20k), starving the pack stage. 4096 words keeps every closed-form
# assertion AND a collision-free decontamination.
VOCAB = 4096


def synth_docs(spark, n_docs: int, tokens_per_doc: int = 48):
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from fhir_etl_spark.operators.classifier import linear_classifier_scores
    from fhir_etl_spark.operators.contamination import (
        bloom_decontaminate,
        contamination_hits,
    )
    from fhir_etl_spark.operators.datasets import shard_shuffle
    from fhir_etl_spark.operators.dedup import (
        dedup_clusters,
        line_dedup,
        ngram_jaccard_pairs,
    )
    from fhir_etl_spark.operators.html import extract_main_content
    from fhir_etl_spark.operators.packing import pack_sequences
    from fhir_etl_spark.operators.text import token_count
    from fhir_etl_spark.functions import ft_weights as fw
    from fhir_etl_spark.queries.capstone import (
        _c5_page_col,
        _stage_and_scan_warc,
    )

    docs = synth_docs(spark, n, tokens_per_doc=48).select(
        "doc_id",
        "text",
        F.concat(F.lit("src"), (F.col("doc_id") % N_SOURCES).cast("string")).alias(
            "source"
        ),
    )

    def stage(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s ({n / dt / 1e3:.1f}k pages/s)", flush=True)
        return out

    # 1. decorate + WARC export + DataSource read-back -------------------
    pages = docs.select("doc_id", _c5_page_col().alias("html"))

    def s1():
        crawled = _stage_and_scan_warc(spark, f"/tmp/smoke_r11_{n}", pages)
        crawled = crawled.localCheckpoint(eager=True)
        assert crawled.count() == n
        return crawled

    crawled = stage("warc export+scan", s1)

    # 2. HTML extraction --------------------------------------------------
    def s2():
        ex = extract_main_content(
            crawled, html_col="html", min_words=5, link_pct=30
        ).localCheckpoint(eager=True)
        agg = ex.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        assert agg["docs"] == n, agg
        # cookie + source tag + one content block, per page, exactly
        assert agg["kept"] == 3 * n, agg
        return ex

    ex = stage("t24 extract", s2)

    # 3. line dedup --------------------------------------------------------
    def s3():
        cleaned = line_dedup(
            ex.select("doc_id", F.col("main_text").alias("text")), min_doc_freq=2
        ).localCheckpoint(eager=True)
        agg = cleaned.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_lines").alias("total"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        assert agg["docs"] == n, agg
        assert agg["total"] == 3 * n, agg
        assert agg["kept"] == n, agg  # cookie + tag stripped everywhere
        return cleaned.select("doc_id", F.col("clean_text").alias("text"))

    cleaned = stage("t26 line dedup", s3)

    # 4. fuzzy dedup --------------------------------------------------------
    def s4():
        pairs = ngram_jaccard_pairs(cleaned, threshold=0.5)
        n_pairs = pairs.count()
        assert n_pairs == 0, f"hash-random corpus produced {n_pairs} near-dup pairs"
        clusters = dedup_clusters(pairs)
        assert clusters.count() == 0
        return cleaned  # all docs survive (closed form for this corpus)

    survivors = stage("fuzzy dedup", s4)

    # 5. decontamination -----------------------------------------------------
    def s5():
        corpus = survivors.filter(F.col("doc_id") % 97 != 0)
        benchmark = survivors.filter(F.col("doc_id") % 97 == 0)
        n_corpus, n_bench = corpus.count(), benchmark.count()
        assert n_corpus + n_bench == n
        decon = bloom_decontaminate(corpus, benchmark, k=3).localCheckpoint(
            eager=True
        )
        n_decon = decon.count()
        # the Bloom-prefiltered path must agree exactly with the exact join
        n_exact_hits = contamination_hits(corpus, benchmark, k=3).count()
        assert n_decon == n_corpus - n_exact_hits, (n_decon, n_corpus, n_exact_hits)
        print(
            f"  decon: corpus={n_corpus} benchmark={n_bench} "
            f"contaminated={n_exact_hits} survivors={n_decon}",
            flush=True,
        )
        return decon

    decon = stage("d11 decontaminate", s5)

    # 6. quality gate (the c5 recipe: t2 >= 0.5 AND >= 10 tokens) ------------
    def s6():
        from fhir_etl_spark.operators.text import quality_score

        q = decon.withColumn("quality", quality_score(F.col("text")))
        n_kept = q.filter(
            (F.col("quality") >= 0.5) & (token_count(F.col("text")) >= 10)
        ).count()
        # 48-token salad scores exactly 0.492 (< 0.5): everything out
        assert n_kept == 0, f"t2 gate passed {n_kept} token-salad docs"
        # regression check: the frozen t22 head must keep rejecting
        # token-salad too (trained on real prose; a pass rate here
        # means the scoring wiring changed)
        scored = linear_classifier_scores(
            decon, fw.W_MICRO, fw.BIAS_MICRO, salt=fw.SALT
        )
        n_cls = scored.filter(F.col("score_micro") > 0).count()
        assert scored.count() == decon.count()
        assert n_cls == 0, f"classifier passed {n_cls} token-salad docs"
        print(f"  gate: t2_kept={n_kept} t22_pos={n_cls}", flush=True)

    stage("quality gate", s6)

    # 7. pack (on the decon set — see module docstring) -----------------------
    def s7():
        with_counts = decon.withColumn("n_tokens", token_count(F.col("text")))
        packed = pack_sequences(
            with_counts, "n_tokens", budget=2048, n_shards=8
        ).localCheckpoint(eager=True)
        assert packed.count() == decon.count()
        bad_budget = (
            packed.groupBy("seq_id")
            .agg(F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("c"))
            .filter((F.col("c") > 1) & (F.col("s") > 2048))
            .count()
        )
        assert bad_budget == 0
        bad_offset = packed.filter(
            (F.col("seq_offset") + F.col("n_tokens") > 2048)
            & (F.col("seq_offset") > 0)
        ).count()
        assert bad_offset == 0
        return packed

    packed = stage("ds5 pack", s7)

    # 8. shard shuffle of the sequences ----------------------------------------
    def s8():
        seqs = packed.select("seq_id").distinct()
        n_seqs = seqs.count()
        placed = shard_shuffle(seqs, "seq_id", n_shards=8).localCheckpoint(
            eager=True
        )
        assert placed.count() == n_seqs
        contiguous = (
            placed.groupBy("shard")
            .agg(F.max("pos").alias("mx"), F.count(F.lit(1)).alias("c"))
            .filter(F.col("mx") != F.col("c"))
            .count()
        )
        assert contiguous == 0  # positions are 1..count per shard
        print(f"  shard: sequences={n_seqs}", flush=True)
        return placed

    stage("ds4 shard", s8)
    print("smoke_r11: ALL STAGES GREEN", flush=True)


if __name__ == "__main__":
    main()
