"""Incremental capstone (VERDICT r11 #4 — c5's streaming twin):

1. stream-vs-batch ROW EQUALITY: folding the page set as epochs and
   serving off state equals a from-scratch batch c5 over the union —
   including the retroactive case (a line crossing the boilerplate
   threshold in a later epoch re-cleans the earlier doc, cascading
   through pairs/clusters/gate/packing).
2. crash-window replay: a crash BETWEEN state-table commits replays to
   the identical state (the first_epoch provenance makes the
   newly-boilerplate set a pure function of the lines table).
3. exactly-once: re-folding an absorbed epoch is a no-op.
4. O(epoch) commits: folding one new no-transition doc appends rows
   proportional to THAT DOC, never the corpus.
5. compaction drops only stale (superseded-revision) rows and the
   served corpus is unchanged.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fhir_etl_spark.queries.capstone import _c5_page_col, c5_capstone_curation
from fhir_etl_spark.session import load_tables
from fhir_etl_spark.streaming import capstone as sc
from tests.conftest import SF_SMALL

N_EPOCHS = 3


def _pages(spark, sf_dir=SF_SMALL):
    documents = load_tables(spark, sf_dir, "documents")
    return documents.select("doc_id", _c5_page_col().alias("html"))


def _fold_all(spark, state_dir, n_epochs=N_EPOCHS):
    pages = _pages(spark)
    for e in range(n_epochs):
        sc.fold_curation_epoch(
            spark, pages.where(F.col("doc_id") % n_epochs == e), state_dir, e
        )


def _pages_adversarial(spark):
    """Epoch assignment that FORCES a late boilerplate transition: one
    src1 document arrives in epoch 0, every other src1 document in
    epoch 2 — the per-source syndication-tag line reaches its 2nd
    distinct doc only at epoch 2, so the epoch-0 doc must be
    retroactively re-cleaned (the mod-3 split never exercises this:
    every source has ≥2 docs inside epoch 0 alone, so every duplicate
    digest saturates immediately)."""
    documents = load_tables(spark, SF_SMALL, "documents")
    m1 = documents.where(F.col("source") == "src1").agg(
        F.min("doc_id")
    ).first()[0]
    epoch = (
        F.when(F.col("doc_id") == m1, F.lit(0))
        .when(F.col("source") == "src1", F.lit(2))
        .otherwise(F.col("doc_id") % 2)
    )
    return documents.select(
        "doc_id", _c5_page_col().alias("html"), epoch.alias("_epoch")
    )


def _fold_adversarial(spark, state_dir):
    pages = _pages_adversarial(spark)
    for e in range(3):
        sc.fold_curation_epoch(
            spark, pages.where(F.col("_epoch") == e).drop("_epoch"), state_dir, e
        )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def batch_c5(spark):
    return _rows(c5_capstone_curation(spark, SF_SMALL))


def test_incremental_equals_batch_c5(spark, tmp_path, batch_c5):
    state = str(tmp_path / "state")
    _fold_all(spark, state)
    got = _rows(sc.read_curated_corpus(spark, state))
    assert got == batch_c5
    assert len(got) > 0  # non-vacuous (the c5 lesson)


def test_retroactive_boilerplate_recleans_history_and_equals_batch(
    spark, tmp_path, batch_c5
):
    """The hard path: a digest's 2nd distinct doc arrives AFTER epoch 0
    (the adversarial split forces the src1 tag line's transition into
    epoch 2), the epoch-0 doc is retroactively re-cleaned (multi-rev
    scalar rows), and the served corpus STILL equals from-scratch batch
    c5 over the union."""
    from fhir_etl_spark.sinks.versioned import read_snapshot

    state = str(tmp_path / "state")
    _fold_adversarial(spark, state)
    lines = read_snapshot(spark, sc._t(state, "lines"))
    later = (
        lines.groupBy("_line_d")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("first_epoch")).alias("ep"),
        )
        .where((F.col("n") >= 2) & (F.element_at("ep", 2) > 0))
        .count()
    )
    assert later > 0
    # and some doc really was re-cleaned (a second revision exists)
    docs = read_snapshot(spark, sc._t(state, "docs"))
    multi_rev = docs.groupBy("doc_id").count().where(F.col("count") > 1).count()
    assert multi_rev > 0
    assert _rows(sc.read_curated_corpus(spark, state)) == batch_c5


def test_crash_between_commits_replays_identically(spark, tmp_path, batch_c5):
    """Crash after the lines commit but before the postings commit:
    replaying the epoch must still re-clean the retroactively-affected
    docs (the bug class the first_epoch provenance exists to kill)."""
    state = str(tmp_path / "state")
    pages = _pages(spark)
    real = sc.merge_index_epoch
    boom = {"armed": False}

    def crashing(spark_, table_path, idx, epoch_id, keys):
        if boom["armed"] and table_path.endswith("postings"):
            boom["armed"] = False
            raise RuntimeError("injected crash before postings commit")
        return real(spark_, table_path, idx, epoch_id, keys)

    sc.merge_index_epoch = crashing
    try:
        sc.fold_curation_epoch(
            spark, pages.where(F.col("doc_id") % N_EPOCHS == 0), state, 0
        )
        boom["armed"] = True
        with pytest.raises(RuntimeError, match="injected crash"):
            sc.fold_curation_epoch(
                spark, pages.where(F.col("doc_id") % N_EPOCHS == 1), state, 1
            )
        # replay epoch 1 (lines table ledger already stamped), then go on
        sc.fold_curation_epoch(
            spark, pages.where(F.col("doc_id") % N_EPOCHS == 1), state, 1
        )
        sc.fold_curation_epoch(
            spark, pages.where(F.col("doc_id") % N_EPOCHS == 2), state, 2
        )
    finally:
        sc.merge_index_epoch = real
    assert _rows(sc.read_curated_corpus(spark, state)) == batch_c5


def test_replayed_epoch_is_noop(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import snapshot_history

    state = str(tmp_path / "state")
    _fold_all(spark, state)
    before = {
        t: snapshot_history(sc._t(state, t))[-1]["version"]
        for t in ("raw", "lines", "docs", "postings", "pairs")
    }
    served = _rows(sc.read_curated_corpus(spark, state))
    pages = _pages(spark)
    sc.fold_curation_epoch(  # replay the last epoch verbatim
        spark,
        pages.where(F.col("doc_id") % N_EPOCHS == N_EPOCHS - 1),
        state,
        N_EPOCHS - 1,
    )
    after = {
        t: snapshot_history(sc._t(state, t))[-1]["version"]
        for t in ("raw", "lines", "docs", "postings", "pairs")
    }
    assert after == before  # ledger fast path: zero new snapshots
    assert _rows(sc.read_curated_corpus(spark, state)) == served


def test_epoch_commit_is_o_epoch_not_o_corpus(spark, tmp_path):
    """One new doc with unique prose and no boilerplate transitions must
    append rows proportional to itself: 1 raw row, its lines, 1 scalar
    row, its shingles, 0 pairs — never a corpus-shaped rewrite."""
    from fhir_etl_spark.sinks.versioned import read_snapshot, snapshot_history

    state = str(tmp_path / "state")
    _fold_all(spark, state)

    def _count(table):
        return read_snapshot(spark, sc._t(state, table)).count()

    before = {t: _count(t) for t in ("raw", "lines", "docs", "postings", "pairs")}
    extra = spark.createDataFrame(
        [(10_000_001, "unique-src", " ".join(f"zq{i}xv" for i in range(40)))],
        "doc_id long, source string, text string",
    ).select("doc_id", _c5_page_col().alias("html"))
    sc.fold_curation_epoch(spark, extra, state, N_EPOCHS)
    after = {t: _count(t) for t in ("raw", "lines", "docs", "postings", "pairs")}
    assert after["raw"] == before["raw"] + 1
    assert after["docs"] == before["docs"] + 1  # exactly one new scalar row
    assert after["pairs"] == before["pairs"]  # unique prose pairs nothing
    # postings delta = the one doc's shingles (strictly, and tiny)
    d_post = after["postings"] - before["postings"]
    assert 0 < d_post < 200
    # the appended snapshot carries ONLY the delta (O(epoch) commit)
    hist = snapshot_history(sc._t(state, "postings"))
    assert hist[-1]["mode"] == "append"


def test_compaction_drops_stale_only_and_serve_is_unchanged(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import read_snapshot

    state = str(tmp_path / "state")
    _fold_adversarial(spark, state)  # re-cleans → stale postings exist
    served = _rows(sc.read_curated_corpus(spark, state))
    post_before = read_snapshot(spark, sc._t(state, "postings")).count()
    dropped = sc.compact_curation_state(spark, state)
    # re-cleans happened (test_retroactive...), so stale postings exist
    assert dropped["postings"] > 0
    post_after = read_snapshot(spark, sc._t(state, "postings")).count()
    assert post_after == post_before - dropped["postings"]
    assert _rows(sc.read_curated_corpus(spark, state)) == served


def test_streaming_wiring_availablenow(spark, tmp_path, batch_c5):
    src = str(tmp_path / "src")
    _pages(spark).repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, html string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = sc.stream_curation_merge(spark, stream, state)
    assert q.awaitTermination(600), "stream did not finish in time"
    assert _rows(sc.read_curated_corpus(spark, state)) == batch_c5
