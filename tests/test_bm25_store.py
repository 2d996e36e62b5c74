"""t23p — persisted BM25 inverted index (operators/retrieval.
bm25_build_or_load): the tokenize + postings/dfreq/stats build committed
once per corpus content fingerprint, retrieval served from the store."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from fhir_etl_spark.operators.retrieval import (
    bm25_build_or_load,
    bm25_index,
    bm25_topk,
)


def _docs(spark):
    rows = [
        (1, "spark table scan over the big table"),
        (2, "vector stream merge with stream buffers"),
        (3, "customer query filter on the customer key"),
        (4, "table scan again and again table table"),
        (5, "unrelated prose about nothing in particular"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "table scan"), (2, "stream merge"), (3, "missing term")],
        "query_id int, query string",
    )


def _topk_rows(spark, postings, dfreq, stats, k=3):
    out = bm25_topk(postings, dfreq, stats, _queries(spark), k=k).collect()
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["score_micro"]) for r in out)


def test_store_equals_direct_build(spark, tmp_path):
    docs = _docs(spark)
    direct = _topk_rows(spark, *bm25_index(docs))
    stored = _topk_rows(
        spark, *bm25_build_or_load(spark, docs, store_dir=str(tmp_path / "bm"))
    )
    assert direct == stored and len(stored) > 0


def test_cache_hit_commits_no_new_snapshot(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import snapshot_history

    docs = _docs(spark)
    store = str(tmp_path / "bm")
    r1 = _topk_rows(spark, *bm25_build_or_load(spark, docs, store_dir=store))
    tables = sorted(
        p for p in glob.glob(os.path.join(store, "bm25-*"))
        if not p.endswith("-meta")
    )
    assert len(tables) == 3  # postings, dfreq, stats
    versions = [len(snapshot_history(t)) for t in tables]
    r2 = _topk_rows(spark, *bm25_build_or_load(spark, docs, store_dir=store))
    assert r1 == r2
    assert [len(snapshot_history(t)) for t in tables] == versions


def test_changed_corpus_rebuilds_under_new_key(spark, tmp_path):
    docs = _docs(spark)
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 5, F.lit("now about table scan too"))
        .otherwise(F.col("text")),
    )
    store = str(tmp_path / "bm")
    bm25_build_or_load(spark, docs, store_dir=store)
    bm25_build_or_load(spark, changed, store_dir=store)
    metas = glob.glob(os.path.join(store, "bm25-*-meta"))
    assert len(metas) == 2  # two corpora, two keyed indexes
    # and the changed corpus's scores differ (doc 5 now matches q1)
    direct = _topk_rows(spark, *bm25_index(changed))
    stored = _topk_rows(
        spark, *bm25_build_or_load(spark, changed, store_dir=store)
    )
    assert direct == stored


def test_serve_path_scans_store_no_corpus_tokenize(spark, tmp_path):
    """Plan-pin: the served top-k plan reads the persisted parquet and
    contains NO explode (the tokenizer's physical signature) — the
    corpus-shaped build work happened at commit time, not per query."""
    docs = _docs(spark)
    postings, dfreq, stats = bm25_build_or_load(
        spark, docs, store_dir=str(tmp_path / "bm")
    )
    out = bm25_topk(postings, dfreq, stats, _queries(spark), k=3)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "parquet" in plan
    # the postings/dfreq/stats sides carry no generate (explode) node;
    # only the (tiny) query-term side may tokenize
    assert plan.count("generate explode") <= 1  # query-term explode only


def test_crash_window_no_meta_means_rebuild(spark, tmp_path):
    """Commit protocol: data tables without the trailing meta row are
    invisible — a caller after a mid-publish crash rebuilds instead of
    serving a partial index."""
    docs = _docs(spark)
    store = str(tmp_path / "bm")
    bm25_build_or_load(spark, docs, store_dir=store)
    metas = glob.glob(os.path.join(store, "bm25-*-meta"))
    assert len(metas) == 1
    import shutil

    shutil.rmtree(metas[0])  # simulate crash before the meta commit
    from fhir_etl_spark.sinks.versioned import snapshot_history

    tables = sorted(
        p for p in glob.glob(os.path.join(store, "bm25-*"))
        if not p.endswith("-meta")
    )
    v_before = [len(snapshot_history(t)) for t in tables]
    bm25_build_or_load(spark, docs, store_dir=store)  # must rebuild
    assert [len(snapshot_history(t)) for t in tables] == [v + 1 for v in v_before]
    assert len(glob.glob(os.path.join(store, "bm25-*-meta"))) == 1
