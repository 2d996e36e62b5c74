"""Scalar-function inventory (SURVEY.md §2.8 F2–F9) exercised over
deterministically constructed columns on the driver testdata.

The testdata has no filenames/MDTM strings/sample IDs, so each query first
derives them from stable key columns — identically on the Spark side and in
the DuckDB oracle — then applies the engine function under test. The
interesting half is the Spark side staying pure-Catalyst (codegen'd, no
Python), per the engine's UDF policy (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
from fhir_etl_spark.queries.registry import query
from fhir_etl_spark.session import load_tables

# Shared filename fabrication (Spark + SQL must agree byte-for-byte):
# chromosome token from p_partkey, extension cycling through the reference's
# interesting cases (compression chains, index files, no extension).
_FNAME_SQL = """
    concat('ALL.chr',
           CASE WHEN p_partkey % 26 = 23 THEN 'X'
                WHEN p_partkey % 26 = 24 THEN 'Y'
                WHEN p_partkey % 26 = 25 THEN 'MT'
                ELSE CAST(p_partkey % 26 AS VARCHAR) END,
           '.phase3',
           CASE p_partkey % 5
             WHEN 0 THEN '.vcf.gz'
             WHEN 1 THEN '.vcf'
             WHEN 2 THEN '.vcf.gz.tbi'
             WHEN 3 THEN '.txt'
             ELSE '' END)
"""


def _fname_col() -> F.Column:
    chrom = (
        F.when(F.col("p_partkey") % 26 == 23, "X")
        .when(F.col("p_partkey") % 26 == 24, "Y")
        .when(F.col("p_partkey") % 26 == 25, "MT")
        .otherwise((F.col("p_partkey") % 26).cast("string"))
    )
    ext = (
        F.when(F.col("p_partkey") % 5 == 0, ".vcf.gz")
        .when(F.col("p_partkey") % 5 == 1, ".vcf")
        .when(F.col("p_partkey") % 5 == 2, ".vcf.gz.tbi")
        .when(F.col("p_partkey") % 5 == 3, ".txt")
        .otherwise("")
    )
    return F.concat(F.lit("ALL.chr"), chrom, F.lit(".phase3"), ext)


@query(
    "f2_file_format",
    oracle=f"""
    SELECT p_partkey, fname,
           CASE WHEN ext = '' THEN 'UNKNOWN' ELSE upper(ext) END AS data_format
    FROM (
      SELECT p_partkey, fname,
             regexp_extract(regexp_replace(fname, '(\\.(gz|tbi|csi))+$', ''),
                            '\\.([^./]+)$', 1) AS ext
      FROM (SELECT p_partkey, {_FNAME_SQL} AS fname FROM part)
    )
    """,
    tags=("function",),
)
def f2_file_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: data format from filename (reference utils.py:58-68) — strip
    compression/index suffix chain, uppercase the remaining extension."""
    part = load_tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        _fname_col().alias("fname"),
        get_data_format(_fname_col()).alias("data_format"),
    )


@query(
    "f3_chromosome",
    oracle=f"""
    SELECT p_partkey,
           CASE WHEN tok = '' THEN NULL ELSE upper(tok) END AS chromosome
    FROM (
      SELECT p_partkey,
             regexp_extract({_FNAME_SQL}, '(?i)\\bchr([0-9XYMT]+)\\b', 1) AS tok
      FROM part
    )
    """,
    tags=("function",),
)
def f3_chromosome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: chromosome extraction (reference utils.py:71-77)."""
    part = load_tables(spark, sf_dir, "part")
    return part.select("p_partkey", get_chromosome(_fname_col()).alias("chromosome"))


@query(
    "f4_mdtm_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(try_strptime(substr(mdtm, 5, 14), '%Y%m%d%H%M%S') AS VARCHAR) AS parsed
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN '213 not-a-date'
                  ELSE concat('213 ', strftime(o_orderdate, '%Y%m%d%H%M%S')) END AS mdtm
      FROM orders
    )
    """,
    tags=("function", "temporal"),
)
def f4_mdtm_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: FTP MDTM parsing (reference utils.py:80-88). Malformed inputs →
    NULL via try_to_timestamp (the reference's now() fallback is
    nondeterministic, so the oracle checks the parse half; the COALESCE
    fallback is unit-tested instead)."""
    orders = load_tables(spark, sf_dir, "orders")
    mdtm = F.when(F.col("o_orderkey") % 10 == 0, F.lit("213 not-a-date")).otherwise(
        F.concat(F.lit("213 "), F.date_format("o_orderdate", "yyyyMMddHHmmss"))
    )
    return orders.select(
        "o_orderkey",
        F.date_format(parse_mdtm(mdtm, fallback_to_now=False), "yyyy-MM-dd HH:mm:ss").alias(
            "parsed"
        ),
    )


@query(
    "f5_mime_type",
    oracle=f"""
    SELECT p_partkey,
           CASE lower(regexp_extract(regexp_replace(fname, '(\\.(gz|Z|bz2|xz|br))+$', ''),
                                     '\\.([^./]+)$', 1))
             WHEN 'vcf' THEN 'text/vcf'
             WHEN 'txt' THEN 'text/plain'
             ELSE 'application/octet-stream' END AS mime
    FROM (SELECT p_partkey, {_FNAME_SQL} AS fname FROM part)
    """,
    tags=("function",),
)
def f5_mime_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: MIME from extension with the reference's custom .vcf registration
    (utils.py:24-25,90-92). Unmapped/missing extensions → the 1KG default."""
    part = load_tables(spark, sf_dir, "part")
    return part.select("p_partkey", get_mime_type(_fname_col()).alias("mime"))


@query(
    "f6_suffix_key",
    oracle="""
    SELECT c_custkey, sampid,
           array_to_string(string_split(sampid, '-')[-2:], '-') AS norm_key
    FROM (
      SELECT c_custkey,
             concat('GTEX-', CAST(c_nationkey AS VARCHAR), '-0003-SM-',
                    CAST(c_custkey AS VARCHAR)) AS sampid
      FROM customer
    )
    """,
    tags=("function",),
)
def f6_suffix_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: last-two-segment key normalization (GTEx SAMPID → aliquot,
    reference gtex_fhirizer.py:93-95)."""
    customer = load_tables(spark, sf_dir, "customer")
    sampid = F.concat(
        F.lit("GTEX-"),
        F.col("c_nationkey").cast("string"),
        F.lit("-0003-SM-"),
        F.col("c_custkey").cast("string"),
    )
    return customer.select(
        "c_custkey", sampid.alias("sampid"), suffix_key(sampid).alias("norm_key")
    )


@query(
    "f7_age_bracket",
    oracle="""
    SELECT p_partkey, bracket,
           printf('%d - %d',
                  2025 - CAST(string_split(bracket, '-')[2] AS INTEGER),
                  2025 - CAST(string_split(bracket, '-')[1] AS INTEGER)) AS birth_range
    FROM (
      SELECT p_partkey,
             concat(CAST((p_size // 10) * 10 AS VARCHAR), '-',
                    CAST((p_size // 10) * 10 + 9 AS VARCHAR)) AS bracket
      FROM part
    )
    """,
    tags=("function",),
)
def f7_age_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: age bracket → birth-year range, reference-frozen year 2025
    (gtex_fhirizer.py:148)."""
    part = load_tables(spark, sf_dir, "part")
    lo = (F.floor(F.col("p_size") / 10) * 10).cast("int")
    bracket = F.concat(lo.cast("string"), F.lit("-"), (lo + 9).cast("string"))
    return part.select(
        "p_partkey",
        bracket.alias("bracket"),
        age_bracket_to_birth_year_range(bracket).alias("birth_range"),
    )


@query(
    "f9_numeric_coercion",
    oracle="""
    SELECT event_id, raw,
           CASE WHEN regexp_matches(raw, '^-?(\\d+(\\.\\d*)?|\\.\\d+)$')
                THEN CAST(raw AS DOUBLE) END AS num
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN event_type
                  ELSE json_extract_string(props, '$.k') END AS raw
      FROM events
    )
    """,
    tags=("function", "json"),
)
def f9_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: numeric-looking string → number, else NULL (reference
    utils.py:189-206), applied to a JSON-extracted value — also exercising
    the JSON-path function surface (get_json_object)."""
    events = load_tables(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 7 == 0, F.col("event_type")).otherwise(
        F.get_json_object("props", "$.k")
    )
    return events.select(
        "event_id", raw.alias("raw"), coerce_numeric_or_null(raw).alias("num")
    )


@query(
    "f1_uuid_splice",
    oracle="""
    WITH h AS (SELECT c_custkey, md5(c_name) AS hx FROM customer)
    SELECT c_custkey,
           concat_ws('-',
             substr(hx, 1, 8),
             substr(hx, 9, 4),
             concat('3', substr(hx, 14, 3)),
             concat(lower(to_hex((CAST(concat('0x', substr(hx, 17, 2)) AS INT) % 64) + 128)),
                    substr(hx, 19, 2)),
             substr(hx, 21, 12)
           ) AS content_uuid
    FROM h
    """,
    tags=("function", "identity"),
)
def f1_uuid_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RFC 4122 byte surgery behind the engine's uuid5 identity mint
    (functions/identity.uuid_splice — reference IDHelper.mint_id,
    utils.py:44-55), value-oracled over md5 since DuckDB lacks sha1; the
    sha1-namespaced composition is pinned bit-identical to CPython by the
    golden-ID tests."""
    from fhir_etl_spark.functions.identity import content_uuid3

    customer = load_tables(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", content_uuid3(F.col("c_name")).alias("content_uuid")
    )
