"""t22 quality-classifier inference: exact integer scoring, degenerate
inputs, frozen-model parity with the offline trainer's featurizer, and
the map-only plan contract (zero shuffles, zero Python)."""

from __future__ import annotations

import hashlib

from fhir_etl_spark.operators.classifier import linear_classifier_scores


def _bucket(gram: str, salt: str, n: int) -> int:
    return int(hashlib.md5((salt + gram).encode()).hexdigest()[:8], 16) % n


def test_hand_computed_score(spark):
    w = [10, -20, 30, -40]
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    got = linear_classifier_scores(
        df, w, bias_micro=5, salt="s", labels=("neg", "pos")
    ).collect()[0]
    grams = ["a", "b", "a b"]
    want = 5 * 3 + sum(w[_bucket(g, "s", 4)] for g in grams)
    assert got["n_grams"] == 3
    assert got["score_micro"] == want
    assert got["label"] == ("pos" if want > 0 else "neg")


def test_empty_and_single_token_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in linear_classifier_scores(
            df, [100, 100], bias_micro=-1, salt="s"
        ).collect()
    }
    # empty/whitespace docs: N = 0 → score 0 → negative label
    for d in (1, 2):
        assert rows[d]["n_grams"] == 0
        assert rows[d]["score_micro"] == 0
        assert rows[d]["label"] == "other"
    # one token: unigram only, no bigram
    assert rows[3]["n_grams"] == 1
    assert rows[3]["score_micro"] == -1 + 100


def test_frozen_model_parity_with_trainer_featurizer(spark):
    """Spark inference must equal the offline featurizer's arithmetic on
    real corpus rows (the train/serve skew check)."""
    from fhir_etl_spark.functions import ft_weights as fw
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents").limit(20)
    got = {
        r["doc_id"]: (r["n_grams"], r["score_micro"], r["label"])
        for r in linear_classifier_scores(
            docs, fw.W_MICRO, fw.BIAS_MICRO, salt=fw.SALT
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        toks = row["text"].split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        score = fw.BIAS_MICRO * len(grams) + sum(
            fw.W_MICRO[_bucket(g, fw.SALT, fw.N_BUCKETS)] for g in grams
        )
        label = "en" if score > 0 else "other"
        assert got[row["doc_id"]] == (len(grams), score, label)


def test_t22_plan_is_map_only_jvm(spark):
    """The 100 TB contract: frozen weights ride as codegen literals —
    no exchange, no broadcast, no Python anywhere in the plan."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.plan_audit import audit

    from fhir_etl_spark.queries import all_queries

    a = audit(
        all_queries()["t22_quality_classifier"].fn(spark, "/root/testdata/sf0.001")
    )
    assert a["shuffles"] == 0
    assert a["bcast"] == 0
    assert a["python"] == "no"


def test_empty_weight_table_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty weight table"):
        linear_classifier_scores(df, [], bias_micro=0, salt="s")
