"""t5b NFKC-class fold: Spark output equals the pure-Python reference
on multilingual fixtures covering every mapping class, ASCII identity,
idempotence, and table-integrity invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_etl_spark.functions.unicode_fold import (
    COMBINING_STRIP,
    CONFUSABLES,
    LIGATURES,
    TRANSLATE_FROM,
    TRANSLATE_TO,
    WIDTH_FOLD,
    fold_py,
)
from fhir_etl_spark.operators.text import nfkc_fold

FIXTURES = [
    "Ｈｅｌｌｏ　ｗｏｒｌｄ！１２３",  # fullwidth + ideographic space
    "рау + сash — сора́х",  # Cyrillic confusables + combining acute
    "Ρlato Νot Οmicron Χi",  # Greek capital confusables
    "ﬁne ﬂow ﬃ ﬄ Ĳssel №5™",  # ligature expansions
    "élève naïve",  # combining acute/grave/diaeresis
    "plain ascii stays put 123 !?",
    "",
    "mixed Ｗｉdth сyrillic ﬁx é",
]


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FIXTURES)], "i long, text string"
    )
    got = {
        r["i"]: r["n"] for r in df.select("i", nfkc_fold("text").alias("n")).collect()
    }
    for i, s in enumerate(FIXTURES):
        assert got[i] == fold_py(s), (s, got[i], fold_py(s))


def test_ascii_is_identity():
    s = "".join(chr(c) for c in range(0x20, 0x7F))
    assert fold_py(s) == s


def test_fold_is_idempotent():
    for s in FIXTURES:
        once = fold_py(s)
        assert fold_py(once) == once


def test_table_integrity():
    # translate args line up: every 1:1 map char has its target, every
    # delete-only char comes after; no char maps twice inconsistently
    assert len(TRANSLATE_FROM) == len(TRANSLATE_TO) + len(COMBINING_STRIP)
    assert len(set(TRANSLATE_FROM)) == len(TRANSLATE_FROM)
    # all targets are ASCII (the point of the fold)
    for v in list(WIDTH_FOLD.values()) + list(CONFUSABLES.values()):
        assert all(ord(c) < 0x80 for c in v)
    for v in LIGATURES.values():
        assert all(ord(c) < 0x80 for c in v)
    # sources are all non-ASCII (never rewrite ASCII content)
    for k in list(WIDTH_FOLD) + list(CONFUSABLES) + list(LIGATURES):
        assert all(ord(c) >= 0x80 for c in k)


def test_decorated_roundtrip_shape(spark):
    """The t5b query's decoration folds back to the predictable ASCII
    prefix on every doc."""
    from fhir_etl_spark.queries import all_queries

    rows = (
        all_queries()["t5b_nfkc_fold"]
        .fn(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .limit(30)
        .collect()
    )
    for r in rows:
        want_prefix = chr(65 + r["doc_id"] % 26) + "xe fi "
        assert r["norm_text"].startswith(want_prefix), r
        assert all(ord(c) < 0x80 for c in r["norm_text"])
