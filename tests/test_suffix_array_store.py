"""d13p — persisted suffix array (round 10, VERDICT r09 #5): the d13
build committed once per corpus (content-fingerprint-keyed snapshot),
then any ExactSubstr threshold answered query-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import (
    corpus_text_fingerprint,
    suffix_array_build_or_load,
    suffix_array_dedup,
    suffix_array_dedup_from_store,
)


def _docs(spark):
    dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two three {dup} four five"),
        (2, f"six seven {dup} eight nine ten"),
        (3, "completely unique text with no repeats at all here"),
        (4, "short doc"),
        (5, f"{dup} leading duplicate case"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_roundtrip_and_cache_hit(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import snapshot_history

    docs = _docs(spark)
    store = str(tmp_path / "sa")
    d1 = suffix_array_build_or_load(spark, docs, store_dir=store)
    rows1 = sorted((r["_id"], r["_p"], r["_d"]) for r in d1.collect())
    import glob
    import os

    tables = [p for p in glob.glob(os.path.join(store, "sa-*")) if not p.endswith("-meta")]
    assert len(tables) == 1
    v_before = len(snapshot_history(tables[0]))
    # second call: cache HIT — no new snapshot committed, same rows
    d2 = suffix_array_build_or_load(spark, docs, store_dir=store)
    rows2 = sorted((r["_id"], r["_p"], r["_d"]) for r in d2.collect())
    assert rows1 == rows2
    assert len(snapshot_history(tables[0])) == v_before


def test_from_store_equals_direct_at_every_threshold(spark, tmp_path):
    """One build answers EVERY min_len: the query-only path must equal
    a from-scratch suffix_array_dedup at each threshold."""
    docs = _docs(spark)
    depths = suffix_array_build_or_load(
        spark, docs, store_dir=str(tmp_path / "sa")
    )
    for min_len in (3, 5, 8):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in suffix_array_dedup_from_store(
                spark, docs, depths, min_len=min_len
            ).collect()
        }
        want = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in suffix_array_dedup(docs, min_len=min_len).collect()
        }
        assert got == want, f"min_len={min_len}"


def test_query_only_path_runs_zero_doubling_rounds(spark, tmp_path):
    """Plan-pin (the VERDICT's 'done' bar): the from-store plan contains
    NO range partitioning — the distributed-rank signature every
    prefix-doubling round and the SA adjacency step require. Zero
    rangepartitioning ⇒ zero rank builds ⇒ the store was actually
    used."""
    docs = _docs(spark)
    depths = suffix_array_build_or_load(
        spark, docs, store_dir=str(tmp_path / "sa")
    )
    out = suffix_array_dedup_from_store(spark, docs, depths, min_len=5)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" not in plan
    # and it reads the persisted parquet, not an in-memory lineage
    assert "parquet" in plan


def test_changed_corpus_changes_fingerprint_and_rebuilds(spark, tmp_path):
    docs = _docs(spark)
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("now a different text")).otherwise(
            F.col("text")
        ),
    )
    assert corpus_text_fingerprint(docs) != corpus_text_fingerprint(changed)
    store = str(tmp_path / "sa")
    suffix_array_build_or_load(spark, docs, store_dir=store)
    suffix_array_build_or_load(spark, changed, store_dir=store)
    import glob
    import os

    tables = [p for p in glob.glob(os.path.join(store, "sa-*")) if not p.endswith("-meta")]
    assert len(tables) == 2  # two corpora, two keyed tables


def test_fingerprint_is_order_independent(spark):
    docs = _docs(spark)
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(7)
    assert corpus_text_fingerprint(docs) == corpus_text_fingerprint(shuffled)


def test_from_store_validates_span_floor(spark, tmp_path):
    docs = _docs(spark)
    depths = suffix_array_build_or_load(
        spark, docs, store_dir=str(tmp_path / "sa")
    )
    with pytest.raises(ValueError):
        suffix_array_dedup_from_store(
            spark, docs, depths, min_len=8, min_span_tokens=4
        )
