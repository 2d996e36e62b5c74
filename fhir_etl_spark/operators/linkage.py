"""Fuzzy string matching / record linkage: all cross-table pairs within
a small edit distance, WITHOUT the quadratic compare.

Candidate generation is FastSS deletion-variant blocking (Bocek et al.
2007, public method — the spell-checker/entity-resolution standard):
every string emits itself plus its ≤k single-character-deletion
variants; two strings within Levenshtein distance k share at least one
variant (substitution ⇒ same string after deleting the differing
position; insertion/deletion ⇒ one side IS a deletion variant of the
other), so an equi-join on the variant finds every true pair and the
exact ``levenshtein() ≤ k`` verify discards the false candidates. All
Catalyst: variant generation is a codegen `transform` over character
positions, the join is a hash/merge equi join on short strings, the
verify is the built-in levenshtein.

Scale shape: |variants| = n·(len+1) per deletion level — linear blowup,
one shuffle on the variant key; the verify join touches candidates only.
A ``max_bucket_size`` cap guards degenerate variant buckets (thousands
of rows sharing a variant — e.g. a constant column), with the dropped
count logged like the pHash/LSH siblings; note an over-cap bucket can
drop EQUAL-string pairs too, so run exact dedup first if exact
duplicates matter.

Reference parity: the reference has no fuzzy matching; north-star
extension for entity resolution over 100 TB-scale name/address columns.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column, k: int = 1) -> Column:
    """Array of ``col`` plus all variants with up to ``k`` single
    characters deleted (k ≤ 2; variant count is O(len^k))."""
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")
    s = col
    n = F.length(s)
    del1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, n)),
    )
    out = F.array_union(F.array(s), del1)
    if k == 2:
        # second deletion applied to the ALREADY-MATERIALIZED del1 array
        # elements (lambda var d) — inlining the 1-deletion concat into
        # the inner lambda would evaluate it twice per (i, j): Catalyst
        # does no common-subexpression elimination inside higher-order
        # lambdas (the measured ~50× class of slowdown dedup.py documents)
        del2 = F.flatten(
            F.transform(
                del1,
                lambda d: F.transform(
                    F.sequence(F.lit(1), F.length(d)),
                    lambda j: F.concat(
                        F.substring(d, F.lit(1), j - 1),
                        F.substring(d, j + 1, F.length(d)),
                    ),
                ),
            )
        )
        out = F.array_union(out, del2)
    return out


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    max_distance: int = 1,
    left_id: str = "a_id",
    left_text: str = "a_text",
    right_id: str = "b_id",
    right_text: str = "b_text",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein ≤ max_distance`` →
    (left_id, right_id, distance). ``left``/``right`` are two-column
    DataFrames named by the *_id/*_text params; exact result (verify
    join), candidate generation via deletion-variant blocking.

    The (id, text) inputs are pinned with one bounded checkpoint each —
    the plan uses them THREE times (variant explosion, occupancy guard's
    eager job, verify join), and without pinning an expensive upstream
    (a scan + normalization pipeline) would re-execute per use. The
    n·(len+1)-row variant EXPLOSION itself is deliberately left
    recomputable: materializing it costs more than the codegen transform
    that rebuilds it (measured at the 1M-name smoke)."""
    left = left.select(left_id, left_text).localCheckpoint()
    right = right.select(right_id, right_text).localCheckpoint()
    lv = left.select(
        left_id, left_text,
        F.explode(deletion_variants(F.col(left_text), max_distance)).alias("_v"),
    ).select(left_id, "_v").distinct()
    rv = right.select(
        right_id, right_text,
        F.explode(deletion_variants(F.col(right_text), max_distance)).alias("_v"),
    ).select(right_id, "_v").distinct()

    if max_bucket_size is not None:
        occupancy = (
            lv.groupBy("_v").agg(F.count("*").alias("_ln"))
            .join(rv.groupBy("_v").agg(F.count("*").alias("_rn")), "_v")
            .filter(F.col("_ln") * F.col("_rn") > max_bucket_size)
            .select("_v")
            .localCheckpoint()
        )
        n_dropped = occupancy.count()
        if n_dropped:
            logging.getLogger(__name__).warning(
                "fuzzy_match_pairs: %d variant bucket(s) over the %d "
                "pair cap dropped from candidate generation — pairs "
                "confined to those buckets are lost",
                n_dropped, max_bucket_size,
            )
            lv = lv.join(occupancy, "_v", "left_anti")

    cand = lv.join(rv, "_v").select(left_id, right_id).distinct()
    lt = left.select(left_id, left_text)
    rt = right.select(right_id, right_text)
    return (
        cand.join(lt, left_id)
        .join(rt, right_id)
        .select(
            left_id,
            right_id,
            F.levenshtein(F.col(left_text), F.col(right_text)).cast("int").alias(
                "distance"
            ),
        )
        .filter(F.col("distance") <= max_distance)
    )
