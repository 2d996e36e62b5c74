"""m16 — from-spec PDF text codec (functions/pdf.py) + the pdf_text
operator (operators/multimodal.py). Writer→extractor round trips, the
/Length-vs-EOL-heuristic regression the sf0.001 sweep caught (~1% of
zlib payloads end in 0x0A/0x0D), tolerant-parse paths, and the per-row
error contract."""

from __future__ import annotations

import re
import zlib

import pytest

from fhir_etl_spark.functions.pdf import encode_pdf, extract_pdf_text


def test_multipage_roundtrip_with_escapes():
    pages = [
        ["hello world", 'escapes: ( ) \\ " and \t tab'],
        ["page two"],
        [],
    ]
    got = extract_pdf_text(encode_pdf(pages))
    assert got == ["\n".join(p) for p in pages]


def test_uncompressed_stream_roundtrip():
    pages = [["plain stream text", "no flate here"]]
    data = encode_pdf(pages, compress=False)
    assert b"FlateDecode" not in data
    assert extract_pdf_text(data) == ["plain stream text\nno flate here"]


def test_length_honored_when_zlib_payload_ends_in_eol_bytes():
    """The sweep-caught bug: a compressed payload ENDING in 0x0A/0x0D
    must not be truncated by the endstream-EOL heuristic — /Length is
    exact and wins. Search a small space for such a payload."""
    found = None
    for i in range(2000):
        lines = [f"filler line number {i} with words", "second line"]
        payload = zlib.compress(
            b"BT /F1 12 Tf 14 TL 72 720 Td\n("
            + lines[0].encode() + b") Tj\nT*\n(" + lines[1].encode() + b") Tj\nET",
            9,
        )
        if payload.endswith((b"\n", b"\r")):
            found = lines
            break
    assert found is not None, "no EOL-tailed zlib payload in search space"
    assert extract_pdf_text(encode_pdf([found])) == ["\n".join(found)]


def test_broken_startxref_still_extracts_via_object_scan():
    data = encode_pdf([["survives a broken xref"]])
    broken = re.sub(rb"startxref\n\d+", b"startxref\n999999", data)
    assert extract_pdf_text(broken) == ["survives a broken xref"]


def test_missing_trailer_falls_back_to_catalog_scan():
    data = encode_pdf([["found via catalog scan"]])
    no_trailer = data[: data.rfind(b"trailer")]
    assert extract_pdf_text(no_trailer) == ["found via catalog scan"]


def test_nested_pages_tree_and_content_array():
    """Hand-assembled PDF: a Pages node nesting another Pages node, a
    page whose /Contents is an ARRAY of two streams, hex strings, TJ
    arrays (kerning numbers ignored), and the ' next-line operator."""
    c1 = b"BT /F1 12 Tf 72 720 Td [(he) -20 (llo)] TJ\n(next) '\nET"
    c2 = b"BT <776f726c64> Tj ET"  # hex: 'world'
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 2 >>",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R 5 0 R] /Count 2 >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents [6 0 R 7 0 R] >>",
        5: b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>",
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2),
    }
    body = b"%PDF-1.4\n" + b"".join(
        b"%d 0 obj\n%s\nendobj\n" % (n, o) for n, o in sorted(objs.items())
    ) + b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    # page 4: stream1 text, then stream2 appended (BT resets nothing here)
    assert extract_pdf_text(body) == ["hello\nnext\nworld", "world"]


def test_error_paths_raise_value_error():
    with pytest.raises(ValueError, match="missing %PDF- header"):
        extract_pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="no indirect objects"):
        extract_pdf_text(b"%PDF-1.4\njunk only")
    data = encode_pdf([["x"]])
    lzw = data.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode ")
    with pytest.raises(ValueError, match="unsupported stream filter"):
        extract_pdf_text(lzw)


def test_encode_validates_pages():
    # pages=[] became legal in round 11 (ADVICE r10: token-less docs
    # typeset to an empty page tree) — see test_advice_r11.py
    with pytest.raises(ValueError, match="pages"):
        encode_pdf(["not a list of lists"])  # type: ignore[list-item]


def test_operator_isolates_per_row_errors(spark):
    from fhir_etl_spark.operators.multimodal import pdf_text

    good = encode_pdf([["good document text"]])
    rows = [(1, bytearray(good)), (2, bytearray(b"%PDF-1.4\nbroken")), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r["doc"] for r in pdf_text(df).collect()}
    assert out[1]["text"] == "good document text" and out[1]["error"] is None
    assert out[2]["text"] is None and "ValueError" in out[2]["error"]
    assert out[3] is None
