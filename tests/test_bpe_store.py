"""t13p — persisted BPE tokenizer (operators/bpe.bpe_build_or_load):
training committed once per corpus content fingerprint, encode served
from the frozen merge table (VERDICT r10 #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators import bpe as bpe_mod
from fhir_etl_spark.operators.bpe import (
    bpe_build_or_load,
    bpe_encode,
    bpe_train,
)


def _docs(spark, rows=None):
    rows = rows or [
        (1, "low lower lowest low low"),
        (2, "new newer newest new new"),
        (3, "low new low new lower newer"),
        (4, "the low road and the new road"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_equals_direct_training(spark, tmp_path):
    docs = _docs(spark)
    direct = bpe_train(docs, n_merges=5)
    stored = bpe_build_or_load(
        spark, docs, n_merges=5, store_dir=str(tmp_path / "bpe")
    )
    assert stored == direct and len(stored) == 5


def test_warm_store_never_trains(spark, tmp_path, monkeypatch):
    """The serve path must be a pure store read + encode: after the
    first build, bpe_train is made unreachable and the second call must
    still return the identical merges (zero training rounds — the t13p
    plan pin)."""
    docs = _docs(spark)
    store = str(tmp_path / "bpe")
    first = bpe_build_or_load(spark, docs, n_merges=5, store_dir=store)

    def _boom(*a, **k):
        raise AssertionError("bpe_train called on a warm store")

    monkeypatch.setattr(bpe_mod, "bpe_train", _boom)
    second = bpe_build_or_load(spark, docs, n_merges=5, store_dir=store)
    assert second == first


def test_serve_plan_is_map_only(spark, tmp_path):
    """Encoding under the frozen vocabulary is one codegen projection:
    no Exchange, no Aggregate anywhere in the physical plan."""
    docs = _docs(spark)
    store = str(tmp_path / "bpe")
    merges = bpe_build_or_load(spark, docs, n_merges=5, store_dir=store)
    plan = (
        bpe_encode(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Aggregate" not in plan


def test_changed_corpus_rebuilds(spark, tmp_path):
    """A changed corpus changes the content fingerprint → fresh train,
    not a stale hit (the merges genuinely differ here)."""
    store = str(tmp_path / "bpe")
    a = bpe_build_or_load(spark, _docs(spark), n_merges=5, store_dir=store)
    changed = _docs(
        spark,
        rows=[
            (1, "zig zag zig zag zigzag"),
            (2, "zig zag zigging zagging"),
            (3, "zag zig zag zig zag"),
        ],
    )
    b = bpe_build_or_load(spark, changed, n_merges=5, store_dir=store)
    assert a != b
    assert b == bpe_train(changed, n_merges=5)


def test_forced_stale_fingerprint_is_visible(spark, tmp_path):
    """Passing corpus A's fingerprint while serving corpus B hits A's
    store entry — the encode result then DIFFERS from fresh training on
    B. This is the contract the t13p oracle enforces end to end: a
    stale store value-mismatches."""
    from fhir_etl_spark.operators.dedup import corpus_text_fingerprint

    store = str(tmp_path / "bpe")
    docs_a = _docs(spark)
    fp_a = corpus_text_fingerprint(docs_a, "doc_id", "text")
    bpe_build_or_load(spark, docs_a, n_merges=5, store_dir=store)
    docs_b = _docs(
        spark,
        rows=[
            (1, "zig zag zig zag zigzag"),
            (2, "zig zag zigging zagging"),
            (3, "zag zig zag zig zag"),
        ],
    )
    stale = bpe_build_or_load(
        spark, docs_b, n_merges=5, store_dir=store, fingerprint=fp_a
    )
    fresh = bpe_train(docs_b, n_merges=5)
    assert stale != fresh  # the stale vocabulary is observable

    enc_stale = bpe_encode(docs_b, stale).select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("t")
    )
    enc_fresh = bpe_encode(docs_b, fresh).select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("t")
    )
    assert enc_stale.collect() != enc_fresh.collect()


def test_different_recipes_get_distinct_entries(spark, tmp_path):
    """n_merges rides in the store key: 5- and 3-merge recipes coexist
    without clobbering each other (the t13-vs-t13p coexistence story)."""
    docs = _docs(spark)
    store = str(tmp_path / "bpe")
    m5 = bpe_build_or_load(spark, docs, n_merges=5, store_dir=store)
    m3 = bpe_build_or_load(spark, docs, n_merges=3, store_dir=store)
    assert len(m5) == 5 and len(m3) == 3
    assert m5[:3] == m3  # BPE merges are prefix-stable in n_merges


def test_empty_merge_list_roundtrips(spark, tmp_path):
    """A corpus where no pair reaches count 2 trains zero merges; the
    store must commit and serve the empty table, not error."""
    docs = spark.createDataFrame(
        [(1, "ab cd"), (2, "ef gh")], "doc_id long, text string"
    )
    store = str(tmp_path / "bpe")
    built = bpe_build_or_load(spark, docs, n_merges=4, store_dir=store)
    served = bpe_build_or_load(spark, docs, n_merges=4, store_dir=store)
    assert built == served == []


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_t13p_query_matches_oracle(spark, sf):
    from tests.conftest import make_duckdb
    from tests.oracle_harness import compare

    from fhir_etl_spark.queries.registry import get_query

    qd = get_query("t13p_bpe_store")
    compare(qd.fn(spark, sf), make_duckdb(sf), qd.oracle, "t13p")
