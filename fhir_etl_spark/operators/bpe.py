"""Byte-Pair Encoding vocabulary training, distributed.

The real tokenizer-training step of an LLM data pipeline (Sennrich et
al. 2016): start from characters, repeatedly merge the most frequent
adjacent symbol pair across the corpus. The existing token counters
(`operators/text.bpe_ish_token_count`) approximate a TRAINED tokenizer;
this operator trains one.

Distributed shape — the insight is that after the one corpus-wide word
count, training only ever touches the DISTINCT-WORD table (vocab-sized,
orders of magnitude smaller than the corpus):

1. one corpus pass: whitespace words → (word, weight=count) — the only
   corpus-sized shuffle;
2. per merge iteration over the word table:
   a. adjacent-pair counts: explode zip(symbols, symbols[1:]) →
      groupBy(pair) weighted sum — a vocab-sized shuffle;
   b. top pair by (count desc, pair asc — deterministic tie-break):
      TakeOrderedAndProject + a bounded 1-row driver action;
   c. greedy left-to-right replacement of the pair inside every word's
      symbol array via a codegen `aggregate` fold — map-only, no
      Python;
   with `localCheckpoint` every few rounds to truncate lineage (same
   pattern as graph.pagerank / dedup_clusters).

The per-iteration driver action is inherent to BPE (each merge depends
on the previous), matching how every production trainer works; what is
NOT driver-side here is the data: symbol arrays live in executors
throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _merge_pair_expr(arr: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with
    left+right inside a symbol array, as one codegen fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    lowercase: bool = True,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(left, right, weighted
    count)] in merge order. Deterministic: ties broken by pair string
    ascending."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = (
        documents.select(F.explode(F.split(text, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("weight"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),  # chars
                F.array(F.lit(END_OF_WORD)),
            ).alias("syms"),
            "weight",
        )
        .localCheckpoint()
    )

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "weight",
            )
            .groupBy("p")
            .agg(F.sum("weight").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)  # TakeOrderedAndProject: k rows per partition
            .collect()
        )
        if not pairs or pairs[0]["c"] < 2:
            break  # nothing left worth merging
        left, right, count = pairs[0]["p"]["l"], pairs[0]["p"]["r"], pairs[0]["c"]
        merges.append((left, right, int(count)))
        words = words.select(
            _merge_pair_expr(F.col("syms"), left, right).alias("syms"), "weight"
        )
        if (it + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a trained merge list to tokenize ``text_col`` →
    ``array<string>`` of BPE symbols (per-word, with the end-of-word
    sentinel folded into the final symbol of each word). Pure codegen:
    one `transform` per word and one `aggregate` fold per merge."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    word_syms = F.transform(
        F.filter(F.split(text, r"\s+"), lambda w: w != ""),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD))),
    )
    def _apply(left: str, right: str):
        # closure factory, NOT default-arg capture: Spark reads a
        # lambda's parameter count as the HOF arity, and default args
        # count as parameters
        return lambda syms: _merge_pair_expr(syms, left, right)

    for left, right, _ in merges:
        word_syms = F.transform(word_syms, _apply(left, right))
    return df.withColumn(out_col, F.flatten(word_syms))
