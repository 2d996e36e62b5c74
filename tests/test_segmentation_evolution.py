"""t27 sentence segmentation (operators/text.sentence_split) and s18
additive parquet schema evolution — unit semantics beyond the oracles."""

from __future__ import annotations

from pyspark.sql import types as T

from fhir_etl_spark.operators.text import sentence_split


def _sents(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        (r["sent_id"], r["sentence"], r["n_tokens"])
        for r in sentence_split(df).orderBy("sent_id").collect()
    ]


def test_terminator_kept_and_trailing_tail_is_a_sentence(spark):
    assert _sents(spark, "one two. three four? tail no dot") == [
        (0, "one two.", 2),
        (1, "three four?", 2),
        (2, "tail no dot", 3),
    ]


def test_terminator_runs_stay_on_one_sentence(spark):
    assert _sents(spark, "wait what?! really...") == [
        (0, "wait what?!", 2),
        (1, "really...", 1),
    ]


def test_whitespace_only_tail_dropped_numbering_preserved(spark):
    # the trailing all-space segment is numbered then dropped — ids gap,
    # they are positions in the split, not a dense rank
    assert _sents(spark, "a!   ") == [(0, "a!", 1)]


def test_abbreviation_caveat_is_the_documented_rule(spark):
    # rule-based: "e.g. x" splits at every terminator (stated limitation)
    assert [s for _, s, _ in _sents(spark, "e.g. x")] == ["e.", "g.", "x"]


def test_schema_evolution_null_fills_old_generation(spark, tmp_path):
    out = str(tmp_path / "evolve")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double").write.mode(
        "overwrite"
    ).parquet(out)
    spark.createDataFrame(
        [(3, 30.0, "new")], "k long, v double, tag string"
    ).write.mode("append").parquet(out)
    evolved = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    rows = {
        r["k"]: (r["v"], r["tag"])
        for r in spark.read.schema(evolved).parquet(out).collect()
    }
    assert rows == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "new")}
