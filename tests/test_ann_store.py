"""Persisted ANN models (operators/ann_store): save/load round-trip
through the versioned sink, cache-hit-skips-training, fingerprint
sensitivity, and the core correctness claim — the encode-only path
produces bit-identical codes to the train-encode path for the same
frozen model."""

from __future__ import annotations

import pytest

from fhir_etl_spark.operators.ann_store import (
    corpus_fingerprint,
    load_ann_model,
    load_or_train,
    save_ann_model,
)

SF = "/root/testdata/sf0.001"


def _tiny_corpus(spark, n=40, dim=8):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") * i % 7).cast("double") / 3.0,
        ).alias("embedding"),
    )


def test_save_load_roundtrip(spark, tmp_path):
    cb = {(0, 0): [1.0, 2.0], (0, 1): [3.0, 4.5], (1, 0): [0.0, -1.25], (1, 1): [9.0, 0.5]}
    coarse = [[1.0] * 4, [2.0] * 4]
    v = save_ann_model(
        spark, str(tmp_path / "m"), cb, coarse, meta={"name": "t", "k": 2}
    )
    assert v == 0
    got_cb, got_coarse, meta = load_ann_model(spark, str(tmp_path / "m"))
    assert got_cb == cb and got_coarse == coarse
    assert meta == {"name": "t", "k": 2}


def test_load_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_ann_model(spark, str(tmp_path / "nope"))


def test_retrain_publishes_new_version_old_still_readable(spark, tmp_path):
    from fhir_etl_spark.sinks.versioned import read_snapshot

    p = str(tmp_path / "m")
    save_ann_model(spark, p, {(0, 0): [1.0]}, meta={"v": 1})
    v2 = save_ann_model(spark, p, {(0, 0): [2.0]}, meta={"v": 2})
    assert v2 == 1
    cb, _, meta = load_ann_model(spark, p)
    assert cb == {(0, 0): [2.0]} and meta == {"v": 2}
    # time travel: version 1 still serves the old model
    old = {(r["s"], r["c"]): list(r["vec"]) for r in read_snapshot(spark, p, 0).collect()}
    assert old == {(0, 0): [1.0]}


def test_load_or_train_trains_once(spark, tmp_path):
    calls = []

    def train():
        calls.append(1)
        return {(0, 0): [1.0, 2.0]}, [[5.0]]

    for _ in range(3):
        cb, coarse = load_or_train(
            spark, "m", "fp1", {"k": 1}, train, model_root=str(tmp_path)
        )
        assert cb == {(0, 0): [1.0, 2.0]} and coarse == [[5.0]]
    assert len(calls) == 1
    # a different fingerprint or different params retrains
    load_or_train(spark, "m", "fp2", {"k": 1}, train, model_root=str(tmp_path))
    load_or_train(spark, "m", "fp1", {"k": 2}, train, model_root=str(tmp_path))
    assert len(calls) == 3


def test_corpus_fingerprint_tracks_files(tmp_path):
    f = tmp_path / "corpus.parquet"
    f.write_bytes(b"abc")
    fp1 = corpus_fingerprint(str(f))
    assert fp1 == corpus_fingerprint(str(f))
    f.write_bytes(b"abcd")
    assert corpus_fingerprint(str(f)) != fp1
    with pytest.raises(FileNotFoundError):
        corpus_fingerprint(str(tmp_path / "missing"))


def test_pq_encode_matches_train_encode(spark):
    from fhir_etl_spark.operators.similarity import pq_encode, pq_train_encode

    corpus = _tiny_corpus(spark)
    codes, cb = pq_train_encode(corpus, dim=8, m=2, sub_k=4, n_iterations=2)
    want = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(corpus, cb, dim=8, m=2).collect()
    }
    assert got == want


def test_ivf_pq_encode_matches_build(spark):
    from fhir_etl_spark.operators.similarity import ivf_pq_build, ivf_pq_encode

    corpus = _tiny_corpus(spark)
    codes, coarse, cb = ivf_pq_build(
        corpus, dim=8, n_list=3, m=2, sub_k=4, n_iterations=2
    )
    want = {r["vec_id"]: (r["_list"], list(r["codes"])) for r in codes.collect()}
    got = {
        r["vec_id"]: (r["_list"], list(r["codes"]))
        for r in ivf_pq_encode(corpus, coarse, cb, dim=8, m=2).collect()
    }
    assert got == want


def test_encode_shape_guards(spark):
    from fhir_etl_spark.operators.similarity import ivf_pq_encode, pq_encode

    corpus = _tiny_corpus(spark)
    with pytest.raises(ValueError, match="codeword length"):
        pq_encode(corpus, {(0, 0): [1.0, 2.0, 3.0]}, dim=8, m=2)
    with pytest.raises(ValueError, match="empty codebook"):
        pq_encode(corpus, {}, dim=8, m=2)
    with pytest.raises(ValueError, match="empty coarse"):
        ivf_pq_encode(corpus, [], {(0, 0): [1.0] * 4}, dim=8, m=2)
