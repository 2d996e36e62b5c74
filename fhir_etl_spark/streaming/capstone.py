"""Incremental capstone — c5's streaming twin (VERDICT r11 #4): fold a
new crawl epoch into the curated corpus WITHOUT recomputing history,
with the served output row-equal to a from-scratch batch c5 over the
union of every epoch streamed so far.

The hard part is that curation is NOT append-only: a line that appeared
once in epoch 1 and again in epoch 5 becomes boilerplate at epoch 5 —
retroactively changing the epoch-1 document's cleaned text, its quality
score, its shingles, and therefore its near-dup pairs, its cluster, the
contamination verdict, the gate, and the packing. A naive "append the
new epoch's curated rows" design silently diverges from batch the first
time that happens. This module handles it with the merge-on-read layout
every transactional lakehouse uses:

State tables (all under ``{state_dir}/``, all committed through
:func:`streaming.dedup.merge_index_epoch` — versioned-sink atomic
manifests, per-table epoch ledger, insert-if-absent idempotence):

- ``raw`` — extracted page text, keyed (doc_id). Immutable facts.
- ``lines`` — (line digest, doc_id, first_epoch) postings over the RAW
  extracted text. ``first_epoch`` makes "which digests became
  boilerplate in epoch e" a PURE FUNCTION of the table (the 2nd-oldest
  posting's epoch == e), so a crash between state commits replays to
  the identical answer — a pre-fold/post-fold set diff would read
  empty on replay and strand the retroactive re-cleans.
- ``docs`` — (doc_id, rev, quality, n_tokens, n_sh) scalar rows, one
  per (doc, re-clean revision); rev = the epoch that re-cleaned it.
  The CURRENT corpus is max(rev) per doc — old rows are never deleted
  (merge-on-read), :func:`compact_curation_state` garbage-collects.
- ``postings`` — (shingle, doc_id, rev, n) over the CLEANED text of
  that revision. Current view = join on (doc_id, rev=current).
- ``pairs`` — (a, b, a_rev, b_rev, jaccard) exact 3-gram Jaccard ≥
  threshold. A pair row is live iff BOTH endpoint revisions are
  current, so re-cleaning a doc automatically invalidates its old
  pairs with zero deletes; the fold re-mines pairs for CHANGED docs
  against the full posting index (changed × history, never
  history × history again).

Per-epoch fold cost: extraction/cleaning/shingling touch ONLY the
epoch's documents plus the retroactively-affected set (docs holding a
digest that crossed the boilerplate threshold this epoch); every state
commit is O(that delta). The serve side (:func:`read_curated_corpus`)
recomputes clusters → winners → decontamination → gate → pack → shard
from STATE TABLES only — pair rows, per-doc scalars, and the benchmark
shingle postings; raw text is never re-read. That recompute is
corpus-ROWS-shaped (one scalar row per doc + the near-dup pair set),
not corpus-TEXT-shaped — the same split a warehouse makes between fact
maintenance and query serving.

Equality contract (pinned in tests/test_streaming_capstone.py): after
folding any epoch partition of a page set, :func:`read_curated_corpus`
is row-equal to batch ``c5_capstone_curation``'s post-WARC stages over
the union. (The WARC container round-trip itself is s12's byte-exact
oracle and is not re-proven here; the twin streams extracted pages.)
Both sides use the identical operator plans — extract_main_content,
line_dedup_against, exact Jaccard semantics, dedup_clusters,
bloom-equivalent exact contamination, pack_sequences, shard_shuffle —
so the equality is structural, not coincidental. The batch pair miner's
``max_shingle_df`` guard is intentionally NOT applied here (the fold
mines changed × history, which the prefix/cap guards don't map onto);
equality therefore holds whenever the cap does not bind — any cap above
the corpus's true max shingle DF, which is the documented
answer-identical regime.

Reference kin: the reference's three-stage CLI lifecycle run
incrementally (reference cli.py:17-65); the epoch semantics follow the
exactly-once contract of streaming/dedup.merge_index_epoch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_etl_spark.streaming.dedup import line_digest_index, merge_index_epoch

_THRESHOLD = 0.5
_SHINGLE_K = 3
_BENCH_MOD = 97
_PACK_BUDGET = 2048
_N_SHARDS = 8


def _t(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _current_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current scalar row per doc: max(rev) wins (merge-on-read)."""
    from fhir_etl_spark.sinks.versioned import read_snapshot

    docs = read_snapshot(spark, _t(state_dir, "docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("rev"))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _current_postings(spark: SparkSession, state_dir: str) -> DataFrame:
    """Live posting rows: (shingle, doc_id, rev, n) where rev is the
    doc's current revision — one join against the rev head, no deletes."""
    from fhir_etl_spark.sinks.versioned import read_snapshot

    cur = _current_docs(spark, state_dir).select("doc_id", "rev")
    try:
        postings = read_snapshot(spark, _t(state_dir, "postings"))
    except FileNotFoundError:
        # every current doc may have zero shingles (short docs) — the
        # postings table is only created once some doc has ≥k tokens
        return cur.select(
            F.lit(None).cast("string").alias("shingle"),
            "doc_id",
            "rev",
            F.lit(0).cast("long").alias("n"),
        ).where(F.lit(False))
    return postings.join(cur, ["doc_id", "rev"])


def _cleaned_features(cleaned: DataFrame, epoch_id: int) -> DataFrame:
    """(doc_id, rev, quality, n_tokens, n_sh, _sh) over re-cleaned text."""
    from fhir_etl_spark.operators.dedup import shingles_from_tokens
    from fhir_etl_spark.operators.text import quality_score, token_count, tokens

    return cleaned.select(
        "doc_id",
        F.lit(epoch_id).cast("long").alias("rev"),
        quality_score("clean_text").alias("quality"),
        token_count(F.col("clean_text")).cast("long").alias("n_tokens"),
        tokens(F.col("clean_text")).alias("_toks"),
    ).select(
        "doc_id",
        "rev",
        "quality",
        "n_tokens",
        shingles_from_tokens(F.col("_toks"), _SHINGLE_K).alias("_sh"),
    ).select(
        "doc_id",
        "rev",
        "quality",
        "n_tokens",
        F.size("_sh").cast("long").alias("n_sh"),
        "_sh",
    )


def fold_curation_epoch(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    epoch_id: int,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> None:
    """Fold one crawl epoch (doc_id, html pages) into the curation
    state. Each state commit is O(epoch ∪ retroactively-affected), and
    every step is a deterministic function of (state, epoch input), so
    a crash between any two commits replays to the identical state
    (per-table ledgers + insert-if-absent merges)."""
    from fhir_etl_spark.operators.dedup import line_dedup_against
    from fhir_etl_spark.operators.html import extract_main_content
    from fhir_etl_spark.sinks.versioned import read_snapshot

    ex = (
        extract_main_content(pages, html_col=html_col, min_words=5, link_pct=30)
        .select(F.col(id_col).alias("doc_id"), F.col("main_text").alias("text"))
        .localCheckpoint(eager=True)
    )

    # 1. immutable raw-extract store (needed to RE-clean retroactively-
    # affected docs in later epochs without re-crawling)
    merge_index_epoch(spark, _t(state_dir, "raw"), ex, epoch_id, keys=["doc_id"])

    # 2. line-digest postings, stamped with the epoch that FIRST saw
    # each (digest, doc) pair — the provenance that makes step 3 a pure
    # function of the table
    idx = line_digest_index(ex).withColumn(
        "first_epoch", F.lit(epoch_id).cast("long")
    )
    merge_index_epoch(
        spark, _t(state_dir, "lines"), idx, epoch_id, keys=["_line_d", "doc_id"]
    )

    # 3. which digests BECAME boilerplate (2nd distinct doc arrived) in
    # THIS epoch — derived from first_epoch provenance, replay-stable
    lines = read_snapshot(spark, _t(state_dir, "lines"))
    by_digest = lines.groupBy("_line_d").agg(
        F.count("*").alias("_dfreq"),
        F.sort_array(F.collect_list("first_epoch")).alias("_epochs"),
    )
    boiler = by_digest.where(F.col("_dfreq") >= 2).select("_line_d")
    newly = (
        by_digest.where(
            (F.col("_dfreq") >= 2) & (F.element_at("_epochs", 2) == epoch_id)
        ).select("_line_d")
    )

    # 4. affected = this epoch's docs ∪ historical docs holding a newly-
    # boilerplate digest; re-clean them against the FULL boiler set
    hist_affected = lines.join(newly, "_line_d").select("doc_id").distinct()
    affected_ids = (
        ex.select("doc_id").unionByName(hist_affected).distinct()
    )
    raw = read_snapshot(spark, _t(state_dir, "raw"))
    affected_raw = raw.join(affected_ids, "doc_id")
    cleaned = line_dedup_against(affected_raw, boiler).localCheckpoint(eager=True)

    # 5. per-doc scalars at rev = this epoch
    feats = _cleaned_features(cleaned, epoch_id).localCheckpoint(eager=True)
    merge_index_epoch(
        spark,
        _t(state_dir, "docs"),
        feats.select("doc_id", "rev", "quality", "n_tokens", "n_sh"),
        epoch_id,
        keys=["doc_id", "rev"],
    )

    # 6. cleaned-shingle postings at rev = this epoch
    new_postings = feats.select(
        "doc_id", "rev", "n_sh", F.explode_outer("_sh").alias("shingle")
    ).where(F.col("shingle").isNotNull()).select(
        "shingle", "doc_id", "rev", F.col("n_sh").alias("n")
    )
    merge_index_epoch(
        spark,
        _t(state_dir, "postings"),
        new_postings,
        epoch_id,
        keys=["shingle", "doc_id", "rev"],
    )

    # 7. re-mine exact Jaccard pairs for CHANGED docs against the full
    # current index (changed × history — history × history pairs keep
    # their old rows, still live because neither endpoint's rev moved)
    cur_post = _current_postings(spark, state_dir)
    probe = feats.select(
        F.col("doc_id").alias("a"),
        F.col("rev").alias("a_rev"),
        F.col("n_sh").alias("a_n"),
        F.explode_outer("_sh").alias("shingle"),
    ).where(F.col("shingle").isNotNull())
    hits = (
        probe.join(
            cur_post.select(
                "shingle",
                F.col("doc_id").alias("b"),
                F.col("rev").alias("b_rev"),
                F.col("n").alias("b_n"),
            ),
            "shingle",
        )
        .where(F.col("a") != F.col("b"))
        # both endpoints changed this epoch → the join sees the pair
        # from both sides; keep one orientation to not double-count
        .where((F.col("b_rev") != epoch_id) | (F.col("a") < F.col("b")))
    )
    norm = hits.select(
        F.least("a", "b").alias("a"),
        F.greatest("a", "b").alias("b"),
        F.when(F.col("a") < F.col("b"), F.col("a_rev"))
        .otherwise(F.col("b_rev"))
        .alias("a_rev"),
        F.when(F.col("a") < F.col("b"), F.col("b_rev"))
        .otherwise(F.col("a_rev"))
        .alias("b_rev"),
        (F.col("a_n") + F.col("b_n")).alias("s"),
    )
    new_pairs = (
        norm.groupBy("a", "b", "a_rev", "b_rev")
        .agg(F.count("*").alias("inter"), F.min("s").alias("s"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("s") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= _THRESHOLD)
        .select("a", "b", "a_rev", "b_rev", "jaccard")
    )
    merge_index_epoch(
        spark,
        _t(state_dir, "pairs"),
        new_pairs,
        epoch_id,
        keys=["a", "b", "a_rev", "b_rev"],
    )


def read_curated_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """The curated corpus off the maintained state — row-equal to batch
    c5 over everything folded so far: (doc_id, n_tokens, pack_shard,
    seq_id, seq_offset, out_shard, seq_pos). Reads ONLY state tables
    (scalar rows + live pairs + benchmark postings); raw text never
    re-scans."""
    from fhir_etl_spark.operators.datasets import shard_shuffle
    from fhir_etl_spark.operators.dedup import dedup_clusters
    from fhir_etl_spark.operators.packing import pack_sequences
    from fhir_etl_spark.sinks.versioned import read_snapshot

    cur = _current_docs(spark, state_dir).persist()

    # live pairs: both endpoint revisions current
    try:
        pairs = read_snapshot(spark, _t(state_dir, "pairs"))
        rev_a = cur.select(F.col("doc_id").alias("a"), F.col("rev").alias("a_rev"))
        rev_b = cur.select(F.col("doc_id").alias("b"), F.col("rev").alias("b_rev"))
        live_pairs = pairs.join(rev_a, ["a", "a_rev"]).join(rev_b, ["b", "b_rev"])
    except FileNotFoundError:
        live_pairs = spark.createDataFrame(
            [], "a bigint, b bigint, a_rev bigint, b_rev bigint, jaccard double"
        )
    clusters = dedup_clusters(
        live_pairs.select("a", "b", "jaccard")
    ).persist()

    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    winners = (
        clusters.join(cur.select("doc_id", "quality"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )
    singletons = cur.select("doc_id").join(
        clusters.select("doc_id"), "doc_id", "left_anti"
    )
    survivors = winners.unionByName(singletons)

    # decontamination off the posting index: exact shingle overlap with
    # the benchmark slice — identical verdicts to c5's Bloom-prefiltered
    # exact verify (the Bloom tier is a prefilter, not a semantics change)
    post = _current_postings(spark, state_dir)
    bench_sh = post.where(
        F.col("doc_id") % _BENCH_MOD == 0
    ).select("shingle").distinct()
    contaminated = (
        post.where(F.col("doc_id") % _BENCH_MOD != 0)
        .join(bench_sh, "shingle")
        .select("doc_id")
        .distinct()
    )
    kept = (
        survivors.where(F.col("doc_id") % _BENCH_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .join(cur.select("doc_id", "quality", "n_tokens"), "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
    )

    packed = pack_sequences(
        kept, "n_tokens", budget=_PACK_BUDGET, n_shards=_N_SHARDS
    ).persist()
    seqs = packed.select("seq_id").distinct()
    placed = shard_shuffle(seqs, "seq_id", n_shards=_N_SHARDS).select(
        "seq_id",
        F.col("shard").alias("out_shard"),
        F.col("pos").alias("seq_pos"),
    )
    return packed.join(placed, "seq_id").select(
        "doc_id",
        "n_tokens",
        F.col("shard").alias("pack_shard"),
        "seq_id",
        "seq_offset",
        "out_shard",
        "seq_pos",
    )


def compact_curation_state(spark: SparkSession, state_dir: str) -> dict:
    """Garbage-collect merge-on-read debt: drop posting/pair rows whose
    revisions are no longer current and fold each table into one
    generation. Each overwrite is pinned to the snapshot it was derived
    from (require_parent — the compact_counter_state lesson): a fold
    racing this compaction fails LOUDLY instead of losing its rows.
    Returns {table: rows_dropped}."""
    from fhir_etl_spark.sinks.versioned import (
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )

    dropped: dict[str, int] = {}
    cur = _current_docs(spark, state_dir).select("doc_id", "rev")
    for table, join_keys in (
        ("postings", [("doc_id", "rev")]),
        ("pairs", [("a", "a_rev"), ("b", "b_rev")]),
    ):
        path = _t(state_dir, table)
        try:
            head = snapshot_history(path)[-1]["version"]
        except FileNotFoundError:
            continue
        rows = read_snapshot(spark, path, head)
        live = rows
        for doc_key, rev_key in join_keys:
            live = live.join(
                cur.select(
                    F.col("doc_id").alias(doc_key), F.col("rev").alias(rev_key)
                ),
                [doc_key, rev_key],
            )
        live = live.localCheckpoint(eager=True)
        n_before, n_after = rows.count(), live.count()
        if n_after < n_before:
            write_snapshot(live, path, mode="overwrite", require_parent=head)
        dropped[table] = n_before - n_after
    return dropped


def stream_curation_merge(
    spark: SparkSession,
    pages_stream: DataFrame,
    state_dir: str,
    html_col: str = "html",
    id_col: str = "doc_id",
    checkpoint: str | None = None,
):
    """Structured-Streaming wiring for :func:`fold_curation_epoch`:
    each micro-batch of crawled pages folds as one epoch
    (availableNow trigger — drop it for continuous deployment)."""
    if checkpoint is None:
        checkpoint = f"{state_dir}.checkpoint"

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_curation_epoch(
            spark, batch_df, state_dir, epoch_id,
            html_col=html_col, id_col=id_col,
        )

    return (
        pages_stream.writeStream.outputMode("update")
        .foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
