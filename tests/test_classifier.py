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


# --- t22b multi-class head (round 10) ----------------------------------


def test_multiclass_hand_computed_scores_and_argmax(spark):
    from fhir_etl_spark.operators.classifier import multiclass_classifier_scores

    w = [[10, -20, 30, -40], [-5, 15, -25, 35], [1, 2, 3, 4]]
    b = [5, -3, 0]
    labels = ("x", "y", "z")
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    got = multiclass_classifier_scores(
        df, w, b, salt="s", labels=labels
    ).collect()[0]
    grams = ["a", "b", "a b"]
    want = [
        b[j] * 3 + sum(w[j][_bucket(g, "s", 4)] for g in grams)
        for j in range(3)
    ]
    assert got["n_grams"] == 3
    assert [got["score_x"], got["score_y"], got["score_z"]] == want
    top = max(want)
    assert got["label"] == labels[want.index(top)]  # first max wins
    assert got["margin_micro"] == top - sorted(want, reverse=True)[1]


def test_multiclass_tie_breaks_to_earliest_label(spark):
    from fhir_etl_spark.operators.classifier import multiclass_classifier_scores

    # identical weight tables ⇒ all scores equal ⇒ first label wins
    w = [[7, 7], [7, 7], [7, 7]]
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = multiclass_classifier_scores(
        df, w, [0, 0, 0], salt="s", labels=("first", "mid", "last")
    ).collect()[0]
    assert got["label"] == "first"
    assert got["margin_micro"] == 0


def test_multiclass_null_text_is_loud_and_empty_is_zero(spark):
    import pytest

    from fhir_etl_spark.operators.classifier import multiclass_classifier_scores

    w = [[1, 2], [3, 4]]
    bad = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL text"):
        multiclass_classifier_scores(
            bad, w, [0, 0], salt="s", labels=("a", "b")
        ).collect()
    ok = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = multiclass_classifier_scores(
        ok, w, [10, -10], salt="s", labels=("a", "b")
    ).collect()[0]
    assert r["n_grams"] == 0 and r["score_a"] == 0 and r["score_b"] == 0
    assert r["label"] == "a"  # zero tie → earliest


def test_multiclass_validation_errors(spark):
    import pytest

    from fhir_etl_spark.operators.classifier import multiclass_classifier_scores

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 2 labels"):
        multiclass_classifier_scores(df, [[1]], [0], salt="s", labels=("only",))
    with pytest.raises(ValueError, match="length mismatch"):
        multiclass_classifier_scores(
            df, [[1], [2]], [0], salt="s", labels=("a", "b")
        )
    with pytest.raises(ValueError, match="ragged"):
        multiclass_classifier_scores(
            df, [[1, 2], [3]], [0, 0], salt="s", labels=("a", "b")
        )


def test_t22b_frozen_model_parity_with_trainer(spark, sf_dir):
    """Train-serve parity: the offline trainer's numpy featurize+argmax
    must agree with the operator's label on real fixture docs (first
    20 by id) — the multi-class twin of the binary parity test."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from train_t22 import featurize

    from fhir_etl_spark.functions import ft_weights_mc as fmc
    from fhir_etl_spark.queries import all_queries
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents").orderBy("doc_id").limit(20)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        r["doc_id"]: r["label"]
        for r in all_queries()["t22b_multiclass_classifier"]
        .fn(spark, sf_dir)
        .collect()
        if r["doc_id"] in texts
    }
    W = np.array(fmc.CLASS_W_MICRO, dtype=float).T / 1e6  # B × C
    b = np.array(fmc.CLASS_BIAS_MICRO, dtype=float) / 1e6
    for doc_id, text in texts.items():
        z = featurize(text) @ W + b
        # trainer scores are mean-pooled; the operator's are ×N — the
        # argmax is invariant, ties broken to the earliest label both ways
        best = float(z.max())
        want = fmc.LABELS[int(np.argmax(z))]
        # guard against float-tie ambiguity in the parity replay
        if sum(1 for v in z if abs(v - best) < 1e-12) == 1:
            assert got[doc_id] == want, doc_id


def test_t22b_plan_is_map_only_jvm(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.plan_audit import audit

    from fhir_etl_spark.queries import all_queries

    a = audit(
        all_queries()["t22b_multiclass_classifier"].fn(
            spark, "/root/testdata/sf0.001"
        )
    )
    assert a["shuffles"] == 0
    assert a["bcast"] == 0
    assert a["python"] == "no"


# --- t22q learned quality gate (round 12, VERDICT r11 #5) ---------------


def test_t22q_parity_with_trainer_featurizer(spark):
    """Spark inference (meta tokens included) must equal the offline
    trainer's arithmetic on real corpus rows — the train/serve skew
    check for the gate head."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.train_t22q import META_REPEAT, bucket, meta_tokens

    from fhir_etl_spark.functions import ft_weights_q as fq
    from fhir_etl_spark.operators.classifier import quality_gate_scores
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents").limit(20)
    got = {
        r["doc_id"]: (r["n_grams"], r["score_micro"], r["label"])
        for r in quality_gate_scores(
            docs, fq.W_MICRO, fq.BIAS_MICRO, fq.SALT, meta_repeat=fq.META_REPEAT
        ).collect()
    }
    assert META_REPEAT == fq.META_REPEAT
    for row in docs.select("doc_id", "text").collect():
        toks = row["text"].split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams = grams + meta_tokens(row["text"]) * fq.META_REPEAT
        score = fq.BIAS_MICRO * len(grams) + sum(
            fq.W_MICRO[bucket(g)] for g in grams
        )
        label = "keep" if score > 0 else "drop"
        assert got[row["doc_id"]] == (len(grams), score, label)


def test_t22q_accuracy_meaningfully_above_majority(spark):
    """The whole point of retraining (VERDICT r11 #5): the head must
    beat the majority rate on the t2-gate label at sf0.01 — the frozen
    t22 lang head could not (always-negative). Floors: majority is
    0.818 at sf0.01; the head trains at 0.948, pinned here ≥ 0.90."""
    from pyspark.sql import functions as F

    from fhir_etl_spark.functions import ft_weights_q as fq
    from fhir_etl_spark.operators.classifier import quality_gate_scores
    from fhir_etl_spark.operators.text import quality_score
    from fhir_etl_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.01", "documents")
    truth = docs.select(
        "doc_id", (quality_score("text") >= 0.5).alias("want_keep")
    )
    pred = quality_gate_scores(
        docs, fq.W_MICRO, fq.BIAS_MICRO, fq.SALT, meta_repeat=fq.META_REPEAT
    ).select("doc_id", (F.col("score_micro") > 0).alias("got_keep"))
    j = truth.join(pred, "doc_id")
    n = j.count()
    acc = j.where(F.col("want_keep") == F.col("got_keep")).count() / n
    majority_rate = (
        max(
            j.where(F.col("want_keep")).count(),
            j.where(~F.col("want_keep")).count(),
        )
        / n
    )
    assert acc >= 0.90 > majority_rate
    # and the head actually says NO to someone (not a constant head)
    assert 0 < pred.where(F.col("got_keep")).count() < n


def test_t22q_plan_is_map_only_jvm(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.plan_audit import audit

    from fhir_etl_spark.queries import all_queries

    a = audit(
        all_queries()["t22q_learned_quality_gate"].fn(
            spark, "/root/testdata/sf0.001"
        )
    )
    assert a["shuffles"] == 0
    assert a["bcast"] == 0
    assert a["python"] == "no"
