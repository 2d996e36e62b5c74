"""Property tests (hypothesis) for the round-10 session-2 tier:

- line_dedup: a Python reference model over arbitrary multi-line
  corpora (reassembly order, cross-doc-only removal, the all-dropped
  contract), plus the second-pass fixpoint (removal can only shrink a
  line's doc-frequency, so pass 2 over pass 1's output must match the
  model's pass 2 — which the model shows equals pass 1 except for the
  shared-empty-doc corner).
- PDF codec: encode→extract round-trips arbitrary printable
  multi-page layouts exactly (the writer is deterministic, the
  extractor honors /Length), including delimiter-heavy strings.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WS = re.compile(r"[ \t\n\x0b\f\r]+")

# line alphabet includes the normalization-sensitive chars (case, runs
# of spaces/tabs) so digest folding is exercised
_line = st.text(
    alphabet=" \tabcdefgABC().\\\"'xyz",
    min_size=0,
    max_size=24,
)
_doc = st.lists(_line, min_size=1, max_size=6).map(lambda ls: "\n".join(ls))
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _norm(line: str) -> str:
    return _WS.sub(" ", line).strip().lower()


def _model_line_dedup(texts: list[str], min_doc_freq: int = 2):
    """Pure-Python reference of operators/dedup.line_dedup."""
    per_doc = [t.split("\n") for t in texts]
    freq: dict[str, set[int]] = {}
    for i, lines in enumerate(per_doc):
        for ln in lines:
            freq.setdefault(_norm(ln), set()).add(i)
    dup = {d for d, docs in freq.items() if len(docs) >= min_doc_freq}
    out = []
    for i, lines in enumerate(per_doc):
        kept = [ln for ln in lines if _norm(ln) not in dup]
        out.append((i, "\n".join(kept), len(lines), len(kept)))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_corpus)
def test_line_dedup_matches_python_model(spark, texts):
    from fhir_etl_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["clean_text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(df).collect()
    )
    assert got == sorted(_model_line_dedup(texts))


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_corpus)
def test_line_dedup_idempotent_on_its_own_output(spark, texts):
    """Second pass over first-pass output removes nothing: every
    surviving line's digest now appears in < min_doc_freq docs only if
    it did before — removal can only shrink doc-frequency, never grow
    it, so the model proves the fixpoint and Spark must agree."""
    from fhir_etl_spark.operators.dedup import line_dedup

    first = _model_line_dedup(texts)
    df1 = spark.createDataFrame(
        [(i, t) for i, t, _, _ in first], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["clean_text"]) for r in line_dedup(df1).collect()
    )
    # model's second pass == first pass output (empty docs contribute a
    # shared '' line only if ≥2 docs are fully empty — the model covers
    # that case too, so compare against the MODEL, not naive identity)
    second = _model_line_dedup([t for _, t, _, _ in first])
    assert got == sorted((i, t) for i, t, _, _ in second)


_pdf_line = st.text(
    alphabet="abc XYZ()\\\t'\"<>[]/%#\f\b",
    min_size=0,
    max_size=20,
)
_pdf_pages = st.lists(
    st.lists(_pdf_line, min_size=0, max_size=4), min_size=1, max_size=4
)


@settings(max_examples=40, deadline=None)
@given(pages=_pdf_pages, compress=st.booleans())
def test_pdf_roundtrip_arbitrary_printable_pages(pages, compress):
    from fhir_etl_spark.functions.pdf import encode_pdf, extract_pdf_text

    got = extract_pdf_text(encode_pdf(pages, compress=compress))
    assert got == ["\n".join(p) for p in pages]


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_pdf_extractor_never_crashes_unexpectedly(data):
    """Arbitrary bytes → ValueError (the per-row error contract), never
    an unbounded hang or a non-Exception escape; valid-prefix garbage
    included via the %PDF- header graft."""
    from fhir_etl_spark.functions.pdf import extract_pdf_text

    for blob in (data, b"%PDF-1.4\n" + data):
        try:
            out = extract_pdf_text(blob)
            assert isinstance(out, list)
        except Exception as exc:  # noqa: BLE001
            # any Exception subclass is acceptable (the operator
            # catches them per-row); SystemExit/KeyboardInterrupt
            # would escape this clause and fail the test
            assert isinstance(exc, Exception)
