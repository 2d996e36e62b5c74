"""End-to-end training-corpus curation pipeline: the operators of
operators/{text,dedup,contamination,datasets}.py composed in the order a
production corpus build runs them. One function call takes a raw document
table to a leakage-safe, deduplicated, decontaminated, source-balanced,
split-assigned corpus — the workflow the reference's users would otherwise
assemble by hand.

Stage order matters and is the standard one:

1. **Quality/language gate first** (cheapest per row, narrow projection +
   filter, no shuffle): every later stage shuffles less.
2. **Exact dedup** (digest groupBy): removes byte-identical copies before
   the expensive near-dup mining sees them.
3. **Near-dup mining + representative selection**: n-gram Jaccard pairs
   (inverted-index formulation, two shuffles) → connected components →
   keep each cluster's min-id member. At 100 TB swap the exact miner for
   ``lsh_candidate_pairs`` + verification; the downstream contract
   (a pair list) is identical — pass ``pair_miner=``.
4. **Benchmark decontamination** (broadcast benchmark shingles, map-side
   anti join — zero corpus shuffle).
5. **Per-source quota cap** (WindowGroupLimit rank: bounded shuffle even
   on a hot domain).
6. **Leakage-safe split**: split key = near-dup cluster id, reusing the
   pairs mined in stage 3 — near-identical docs can never straddle
   train/test (load-bearing with ``keep_near_dups=True``; with removal it
   degenerates safely to a per-row split).

Every stage is a pure DataFrame transform; nothing collects to the
driver. The returned plan is lazy — callers can ``.write`` it anywhere or
feed it to ``datasets.shard_shuffle`` / ``packing.pack_sequences`` for the
trainer-facing layout.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhir_etl_spark.operators.datasets import leakage_safe_split, quota_cap
from fhir_etl_spark.operators.dedup import (
    dedup_keep_representatives,
    exact_dedup,
    ngram_jaccard_pairs,
)
from fhir_etl_spark.operators.text import lang_id, quality_score


def curate_corpus(
    documents: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    per_source_cap: int | None = None,
    source_col: str = "source",
    split_weights: dict[str, float] | None = None,
    pair_miner: Callable[[DataFrame], DataFrame] | None = None,
    keep_near_dups: bool = False,
    max_xent: float | None = None,
    substring_k: int | None = None,
) -> DataFrame:
    """Raw documents → curated, split-assigned corpus (see module doc).

    ``benchmark``: eval-set documents to decontaminate against (skipped if
    None). ``pair_miner``: documents → (a, b) near-dup pairs; defaults to
    exact n-gram Jaccard at ``jaccard_threshold`` — inject the LSH miner
    at corpus scale. ``per_source_cap``: max docs per ``source_col`` value
    (None = uncapped). ``keep_near_dups=True`` skips stage 3's removal
    (keeping near-dups for diversity) — the cluster-keyed split then does
    the leakage guarding: every cluster member receives the same split.
    With removal (the default) one representative survives per cluster and
    the cluster-keyed split degenerates to a per-row split, which is then
    already safe. Output = input columns + ``split``.

    ``max_xent``: drop documents whose cross-entropy under the corpus's
    own bigram LM exceeds the threshold (CCNet-style perplexity gate,
    stage 1.5 — the LM is fit on the quality-gated corpus itself).
    ``substring_k``: after near-dup handling, delete every ``k``-token
    span that occurs ≥2 times anywhere in the surviving corpus
    (ExactSubstr, stage 3.5) — ``text_col`` is REWRITTEN to the cleaned
    text and docs scrubbed to emptiness are dropped.
    """
    if split_weights is None:
        split_weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if pair_miner is None:
        def pair_miner(df: DataFrame) -> DataFrame:
            return ngram_jaccard_pairs(
                df, id_col=id_col, text_col=text_col, threshold=jaccard_threshold
            )

    # 1. quality / language gate — narrow filter, pushdown-friendly
    gated = documents.filter(
        lang_id(F.col(text_col)).isin(*keep_langs)
        & (quality_score(F.col(text_col)) >= min_quality)
    )

    # 1.5 LM-perplexity gate: fit the bigram LM on the quality-gated
    # corpus, drop docs whose transitions the corpus itself finds
    # improbable (CCNet recipe; the LM join is corpus-internal, no
    # external model)
    if max_xent is not None:
        from fhir_etl_spark.operators.text import lm_cross_entropy

        # Gate by ANTI-join against the over-threshold docs, not semi-join
        # against the under-threshold ones: lm_cross_entropy emits NO row
        # for docs with zero bigrams (< 2 whitespace tokens), and their
        # perplexity is undefined, not high — a semi-join would silently
        # drop them regardless of threshold (ADVICE r04).
        bad_ids = (
            lm_cross_entropy(gated, id_col=id_col, text_col=text_col)
            .filter(F.col("xent") > max_xent)
            .select(id_col)
        )
        gated = gated.join(bad_ids, id_col, "left_anti")

    # 2. exact dedup (digest groupBy, min-id representative)
    deduped_ids = exact_dedup(gated, id_col=id_col, text_col=text_col).select(id_col)
    exact_unique = gated.join(deduped_ids, id_col, "left_semi")

    # 3. near-dup mining → keep one representative per cluster (or keep
    # all members and rely on the cluster-keyed split below)
    pairs = pair_miner(exact_unique)
    if keep_near_dups:
        near_unique = exact_unique
    else:
        near_unique = dedup_keep_representatives(exact_unique, pairs, id_col=id_col)

    # 3.5 ExactSubstr: scrub k-token spans duplicated anywhere in the
    # surviving corpus; text_col is rewritten, empty survivors dropped
    if substring_k is not None:
        from fhir_etl_spark.operators.dedup import substring_dedup

        cleaned = substring_dedup(
            near_unique, k=substring_k, id_col=id_col, text_col=text_col,
            gram_key="hash",
        ).select(id_col, "clean_text")
        near_unique = (
            near_unique.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("clean_text", text_col)
            .filter(F.col(text_col) != "")
        )

    # 4. benchmark decontamination (broadcast, zero corpus shuffle)
    if benchmark is not None:
        from fhir_etl_spark.operators.contamination import decontaminate

        near_unique = decontaminate(
            near_unique, benchmark, id_col=id_col, text_col=text_col
        )

    # 5. per-source quota cap
    if per_source_cap is not None:
        near_unique = quota_cap(
            near_unique, source_col, per_source_cap, order_key=id_col
        )

    # 6. leakage-safe split. The full pair list is the right cluster key
    # even after removals: a surviving member's cluster_id is the
    # component min id, a pure function of the mined graph — stable no
    # matter which members stages 3-5 dropped.
    return leakage_safe_split(near_unique, pairs, id_col, split_weights)
