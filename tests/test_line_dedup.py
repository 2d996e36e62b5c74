"""t26 cross-document line-level dedup (operators/dedup.line_dedup) —
the RefinedWeb/CCNet boilerplate-line removal stage. Unit tests for the
keep/drop semantics, order-preserving reassembly, normalization policy,
thresholds, and the all-boilerplate document contract; plus a plan pin
(no Python nodes, no raw-text double shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.dedup import line_dedup

BOILER = "Please accept cookies"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _result(spark, rows, **kw):
    out = line_dedup(_docs(spark, rows), **kw).collect()
    return {r["doc_id"]: r for r in sorted(out, key=lambda r: r["doc_id"])}


def test_boilerplate_stripped_everywhere_unique_lines_kept_in_order(spark):
    r = _result(
        spark,
        [
            (1, f"{BOILER}\nalpha one\nbeta two\n{BOILER}"),
            (2, f"{BOILER}\ngamma three"),
            (3, f"delta four\n{BOILER}"),
        ],
    )
    assert r[1]["clean_text"] == "alpha one\nbeta two"
    assert (r[1]["n_lines"], r[1]["n_kept"]) == (4, 2)
    assert r[2]["clean_text"] == "gamma three"
    assert r[3]["clean_text"] == "delta four"


def test_all_boilerplate_doc_survives_empty(spark):
    r = _result(
        spark,
        [(1, f"{BOILER}\n{BOILER}"), (2, BOILER), (3, "unique prose line")],
    )
    assert (r[1]["clean_text"], r[1]["n_kept"], r[1]["n_lines"]) == ("", 0, 2)
    assert (r[2]["clean_text"], r[2]["n_kept"]) == ("", 0)
    assert r[3]["clean_text"] == "unique prose line"


def test_within_doc_repeats_kept_when_not_cross_doc(spark):
    # doc_freq counts DISTINCT documents: a line repeated 3× inside ONE
    # document is not cross-document boilerplate and every copy stays.
    r = _result(spark, [(1, "echo\necho\necho"), (2, "other text")])
    assert r[1]["clean_text"] == "echo\necho\necho"
    assert r[1]["n_kept"] == 3


def test_normalization_case_and_whitespace_fold_into_one_digest(spark):
    # "Cookie  Notice" ≡ "cookie notice" under the content_digest policy —
    # both copies are the same line in 2 distinct docs → both dropped.
    r = _result(
        spark,
        [(1, "Cookie  Notice\nkeep me"), (2, "cookie notice\nme too")],
    )
    assert r[1]["clean_text"] == "keep me"
    assert r[2]["clean_text"] == "me too"


def test_min_doc_freq_threshold_boundary(spark):
    rows = [
        (1, "shared pair\nmine one"),
        (2, "shared pair\nmine two"),
        (3, "shared trio\nmine three"),
        (4, "shared trio\nmine four"),
        (5, "shared trio\nmine five"),
    ]
    r3 = _result(spark, rows, min_doc_freq=3)
    # freq-2 line survives a ≥3 threshold; freq-3 line does not
    assert r3[1]["clean_text"] == "shared pair\nmine one"
    assert r3[3]["clean_text"] == "mine three"
    r2 = _result(spark, rows, min_doc_freq=2)
    assert r2[1]["clean_text"] == "mine one"


def test_trailing_newline_yields_trailing_empty_line(spark):
    # split keeps trailing empties (Java limit -1 == DuckDB string_split);
    # a single doc's trailing empty line is unique → kept, round-trips.
    r = _result(spark, [(1, "solo line\n"), (2, "unrelated")])
    assert r[1]["n_lines"] == 2
    assert r[1]["clean_text"] == "solo line\n"


def test_min_doc_freq_validation(spark):
    with pytest.raises(ValueError, match="min_doc_freq"):
        line_dedup(_docs(spark, [(1, "x")]), min_doc_freq=1)


def test_plan_no_python_and_single_text_shuffle(spark):
    """Plan pin: pure built-in expressions (no Python nodes), and the
    raw line text crosses at most two exchanges (anti-join survivor
    stream + doc reassembly) — the digest-frequency aggregation must
    shuffle (digest, doc_id) pairs only."""
    df = _docs(spark, [(1, "a\nb"), (2, "b\nc")])
    plan = (
        line_dedup(df)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan
    # the countDistinct aggregate runs on the digest, not the line text
    assert "countDistinct" not in plan or "line" not in plan.split("countDistinct")[0][-200:]


def test_composes_with_t26_decoration_against_fixture(spark, sf_dir):
    """End-to-end over the real fixture decoration: header/footer/source
    lines vanish from every doc; every output doc keeps only content."""
    from fhir_etl_spark.queries.text import _T26_FOOTER, _T26_HEADER, t26_line_dedup

    out = t26_line_dedup(spark, sf_dir).limit(50).collect()
    assert len(out) > 0
    for r in out:
        assert _T26_HEADER not in r["clean_text"]
        assert _T26_FOOTER not in r["clean_text"]
        assert not any(
            ln.startswith("source: ") for ln in r["clean_text"].split("\n")
        )
        assert r["n_kept"] <= r["n_lines"] - 3  # ≥3 boilerplate lines dropped
