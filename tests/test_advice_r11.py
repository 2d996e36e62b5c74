"""Repro tests for the round-10 ADVICE items:

1. (medium) m16: a token-less document typesets to zero pages —
   ``encode_pdf([])`` must emit a valid empty page tree and the whole
   m16 pipeline must match its oracle (n_pages=0, text='') instead of
   failing the batch with a ValueError inside the build mapInPandas.
2. (low) t26: the SQL page twin must agree with the Spark concat_ws
   builder for token-less documents (no phantom empty content line).
3. (low) pdf: ``\\8`` / ``\\9`` literal-string escapes decode to the
   character itself per §7.3.4, not a ValueError from ``int(b'', 8)``.
4. (low) pdf: when a stream payload contains ``N G obj … endobj`` byte
   patterns, the tolerant regex scan mis-spans objects — extraction
   must fall back to xref-offset object location instead of erroring.
5. (low) bm25_build_or_load: the serve path with an explicit
   ``fingerprint=`` must hit the same store (zero corpus-shaped work —
   the docstring's softened claim) and return identical tables.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from fhir_etl_spark.functions.pdf import (
    _Lexer,
    _parse_objects,
    encode_pdf,
    extract_pdf_text,
)
from tests.oracle_harness import compare

# --- 3: \8 \9 escapes ----------------------------------------------------


def test_literal_string_escape_8_9_decode_to_digits():
    assert _Lexer(rb"(\8\9)")._literal_string() == "89"


def test_literal_string_octal_still_octal():
    # a real octal escape is unaffected by the digit-branch narrowing
    assert _Lexer(rb"(\101\12)")._literal_string() == "A\n"
    # octal stops at 3 digits; the 4th is a literal char
    assert _Lexer(rb"(\1018)")._literal_string() == "A8"


def test_escape_8_9_survive_full_roundtrip():
    # handcraft the content via an uncompressed page whose line the
    # writer emits verbatim, then poison the escapes post-hoc
    pdf = encode_pdf([["mark89"]], compress=False)
    poisoned = pdf.replace(b"(mark89)", rb"(mark\8\9)")
    assert poisoned != pdf
    assert extract_pdf_text(poisoned) == ["mark89"]


# --- 4: endobj bytes inside a stream payload -----------------------------

_POISON_PAGES = [["alpha endobj beta", "3 0 obj garbage endobj", "gamma"]]


def test_tolerant_scan_is_actually_poisoned():
    """The fixture really exercises the failure: the regex object index
    mis-keys object 3 to garbage (later-occurrence-wins)."""
    data = encode_pdf(_POISON_PAGES, compress=False)
    objs = _parse_objects(data)
    assert b"garbage" in objs[3]  # the in-stream shadow won


def test_endobj_in_stream_payload_falls_back_to_xref():
    data = encode_pdf(_POISON_PAGES, compress=False)
    assert extract_pdf_text(data) == ["\n".join(_POISON_PAGES[0])]


def test_clean_pdf_unaffected_by_fallback_path():
    data = encode_pdf([["hello world"], ["second page"]])
    assert extract_pdf_text(data) == ["hello world", "second page"]


# --- 1: zero-page documents ----------------------------------------------


def test_encode_pdf_empty_pages_roundtrip():
    data = encode_pdf([])
    assert data.startswith(b"%PDF-")
    assert extract_pdf_text(data) == []


def test_pdf_text_operator_zero_pages(spark):
    from fhir_etl_spark.operators.multimodal import pdf_text

    df = spark.createDataFrame(
        [(1, bytearray(encode_pdf([])))], "doc_id long, media binary"
    )
    row = pdf_text(df).select("doc.*").collect()[0]
    assert (row["n_pages"], row["text"], row["n_chars"], row["error"]) == (
        0,
        "",
        0,
        None,
    )


# --- 1+2: empty-text docs through the full m16 / t26 query+oracle --------


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    """A minimal sf dir whose documents table plants the ADVICE edge
    cases: an empty-text doc, a whitespace-only doc (tokenizes to zero
    tokens), and two normal docs sharing no lines."""
    d = tmp_path_factory.mktemp("edge_sf")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "",
                " \t ",
                "the quick brown fox jumps over the lazy dog again and again today",
                "pack my box with five dozen liquor jugs for the long trip home now",
            ],
            "lang": ["en"] * 4,
            "source": ["src0", "src1", "src0", "src1"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def _edge_con(edge_sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"'{edge_sf_dir}/documents.parquet'"
    )
    return con


def test_m16_matches_oracle_with_empty_docs(spark, edge_sf_dir):
    from fhir_etl_spark.queries.registry import get_query

    qd = get_query("m16_pdf_text")
    compare(qd.fn(spark, edge_sf_dir), _edge_con(edge_sf_dir), qd.oracle, "m16-edge")


def test_t26_matches_oracle_with_empty_docs(spark, edge_sf_dir):
    from fhir_etl_spark.queries.registry import get_query

    qd = get_query("t26_line_dedup")
    compare(qd.fn(spark, edge_sf_dir), _edge_con(edge_sf_dir), qd.oracle, "t26-edge")


def test_c3_matches_oracle_with_empty_docs(spark, edge_sf_dir):
    """c3 composes the t26 page builder too — the empty-case fix must
    hold through the composed pipeline."""
    from fhir_etl_spark.queries.registry import get_query

    qd = get_query("c3_line_curation_pipeline")
    compare(qd.fn(spark, edge_sf_dir), _edge_con(edge_sf_dir), qd.oracle, "c3-edge")


# --- 5: bm25 serve path with explicit fingerprint ------------------------


def test_bm25_store_explicit_fingerprint_hits_same_store(spark, tmp_path):
    from fhir_etl_spark.operators.dedup import corpus_text_fingerprint
    from fhir_etl_spark.operators.retrieval import bm25_build_or_load

    docs = spark.createDataFrame(
        [(1, "spark scan table"), (2, "stream merge vector"), (3, "spark stream")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bm25")
    p1, d1, s1 = bm25_build_or_load(spark, docs, store_dir=store)
    fp = corpus_text_fingerprint(docs, "doc_id", "text")
    p2, d2, s2 = bm25_build_or_load(spark, docs, store_dir=store, fingerprint=fp)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    assert s1.collect() == s2.collect()


# --- r11 perf fix: chunked gzip-member walk ------------------------------


def test_gzip_members_chunked_walk_boundaries():
    """The O(total-bytes) chunked rewind must handle members smaller
    than one chunk, members spanning several chunks, and exact
    chunk-boundary landings — byte-identical to the naive walk."""
    import zlib

    from fhir_etl_spark.sources.warc import _GZ_CHUNK, _gzip_members

    members = [b"small-%d " % i * 3 for i in range(50)]
    members.append(b"B" * (3 * _GZ_CHUNK + 17))  # spans >3 chunks
    members.append(b"tail")
    parts = []
    for m in members:
        c = zlib.compressobj(wbits=31)
        parts.append(c.compress(m) + c.flush())
    blob = b"".join(parts)
    assert list(_gzip_members(blob)) == members


def test_gzip_members_truncated_raises():
    import zlib

    import pytest as _pytest

    from fhir_etl_spark.sources.warc import _gzip_members

    c = zlib.compressobj(wbits=31)
    blob = (c.compress(b"payload here") + c.flush())[:-4]
    with _pytest.raises(ValueError, match="truncated"):
        list(_gzip_members(blob))
