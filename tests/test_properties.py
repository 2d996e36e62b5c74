"""Property-based tests (hypothesis): uuid5 bit-parity on arbitrary inputs,
prune semantics vs an independent reimplementation of the reference's
truth table, numeric coercion vs the reference's predicate."""

from __future__ import annotations

import json
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fhir_etl_spark.functions.identity import fhir_uuid5, namespace_for_site

NS = namespace_for_site("https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/")

# One Spark job per example is too slow; run each property over a BATCH of
# generated inputs in a single job.
text_batches = st.lists(
    st.text(min_size=0, max_size=200), min_size=1, max_size=50
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(names=text_batches)
def test_uuid5_sql_path_matches_cpython(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select("name", fhir_uuid5(NS, "name").alias("u")).collect()
    for r in rows:
        assert r["u"] == str(uuid.uuid5(NS, r["name"])), repr(r["name"])


# --- prune property: fixed schema, arbitrary values ------------------------

PRUNE_SCHEMA = (
    "s string, n bigint, flag boolean, arr array<string>, "
    "nested struct<a:string, b:array<struct<x:string, y:bigint>>>"
)


def reference_prune(data):
    """Independent reimplementation of the reference's remove_empty_dicts
    truth table (utils.py:138-161): drop empty strings/dicts/lists and
    None at any depth, keep 0/False; empty list → dropped at parent."""
    if isinstance(data, dict):
        out = {}
        for k, v in data.items():
            if isinstance(v, (dict, list)):
                cleaned = reference_prune(v)
                if cleaned or cleaned == 0:
                    out[k] = cleaned
            elif v or v == 0:
                out[k] = v
        return out
    if isinstance(data, list):
        cleaned = [reference_prune(item) for item in data]
        cleaned = [item for item in cleaned if item or item == 0]
        return cleaned if cleaned else None
    return data


maybe_str = st.one_of(st.none(), st.just(""), st.text(max_size=5))
maybe_int = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
row_strategy = st.fixed_dictionaries(
    {
        "s": maybe_str,
        "n": maybe_int,
        "flag": st.one_of(st.none(), st.booleans()),
        "arr": st.one_of(st.none(), st.lists(maybe_str, max_size=3)),
        "nested": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {
                    "a": maybe_str,
                    "b": st.one_of(
                        st.none(),
                        st.lists(
                            st.fixed_dictionaries({"x": maybe_str, "y": maybe_int}),
                            max_size=3,
                        ),
                    ),
                }
            ),
        ),
    }
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_strategy, min_size=1, max_size=20))
def test_prune_matches_reference_semantics(spark, rows):
    from pyspark.sql import functions as F

    from fhir_etl_spark.sinks.ndjson import serialize

    df = spark.createDataFrame(
        [(r["s"], r["n"], r["flag"], r["arr"], _nested_tuple(r["nested"])) for r in rows],
        PRUNE_SCHEMA,
    ).select(F.struct("s", "n", "flag", "arr", "nested").alias("resource"))
    got = [json.loads(r["json"]) for r in serialize(df).collect()]
    expected = [reference_prune(_clean_dict(r)) for r in rows]
    assert got == expected


def _nested_tuple(nested):
    if nested is None:
        return None
    b = nested["b"]
    return (
        nested["a"],
        None if b is None else [(e["x"], e["y"]) for e in b],
    )


def _clean_dict(r):
    """The dict a pydantic model_dump would produce for this row (None kept —
    reference_prune drops them, as remove_empty_dicts does)."""
    return {
        "s": r["s"],
        "n": r["n"],
        "flag": r["flag"],
        "arr": r["arr"],
        "nested": r["nested"],
    }


# --- numeric coercion property --------------------------------------------


def reference_coerce(value: str):
    """The reference's numeric-string predicate (utils.py:199-205): digits
    with one optional leading '-', optional '.', → float iff '.' present.

    The reference's isdigit() gate passes strings its int()/float() then
    RAISES on — superscripts ('²'), a non-leading '-' ('5-4'),
    multiple dots ('1.2.3') — killing the whole pipeline. The engine's
    documented policy maps those reference-crash inputs to NULL, so this
    replica returns None where the reference would raise.

    DOCUMENTED DIVERGENCE (ADVICE r04): non-ASCII Unicode decimal digits
    ('٥', '５') pass isdigit() AND convert successfully in the reference
    (int('٥') == 5, no crash), while the engine's Java-regex \\d is
    ASCII-only and yields NULL. The engine keeps ASCII-only semantics on
    purpose — Spark's string→double cast does not parse non-ASCII digits,
    so 'matching' would need a ~650-codepoint translate table for a case
    the reference's genomics TSVs never contain. The replica therefore
    ASCII-gates first, encoding the divergence rather than hiding it."""
    if not value.isascii():
        return None  # engine policy; the reference would convert Nd digits
    if not value.replace(".", "").replace("-", "", 1).isdigit():
        return None
    try:
        return float(value) if "." in value else int(value)
    except ValueError:  # the reference would crash here
        return None


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    values=st.lists(
        st.one_of(
            st.text(max_size=10),
            st.from_regex(r"-?[0-9]{1,8}(\.[0-9]{1,4})?", fullmatch=True),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_coerce_numeric_matches_reference(spark, values):
    from fhir_etl_spark.functions.numeric import coerce_numeric_or_null

    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select("v", coerce_numeric_or_null("v").alias("n")).collect()
    for r in rows:
        expected = reference_coerce(r["v"])
        if expected is None:
            assert r["n"] is None, repr(r["v"])
        else:
            assert r["n"] == pytest.approx(float(expected)), repr(r["v"])

def test_coerce_numeric_unicode_digits_documented_divergence(spark):
    """Pin the ADVICE-r04 divergence deterministically (hypothesis only
    finds it by luck): Arabic-Indic '٥' and fullwidth '５' convert in the
    reference (int('٥') == 5) but are NULL in the engine AND None in the
    ASCII-gated replica — so the property test can never flake on them."""
    from fhir_etl_spark.functions.numeric import coerce_numeric_or_null

    cases = ["٥", "５", "١٢٣", "5٥", "²"]
    assert all(reference_coerce(v) is None for v in cases)
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    rows = df.select(coerce_numeric_or_null("v").alias("n")).collect()
    assert all(r["n"] is None for r in rows)
    # and the reference really would convert the pure-Nd ones (the divergence)
    assert int("٥") == 5 and float("５") == 5.0


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_zorder_key_properties(spark, pts):
    """The distributed z-value equals a from-scratch local reconstruction
    (bucketization + bit interleave) for arbitrary integer point sets."""
    from fhir_etl_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long")
    out = zorder_key(df, ["x", "y"], bits=8).collect()
    xs = [r["x"] for r in out]
    ys = [r["y"] for r in out]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)

    def bucket(v, lo, hi):
        return ((v - lo) * 256) // (hi - lo + 1)

    def interleave(bx, by):
        z = 0
        for bit in range(8):
            z |= ((bx >> bit) & 1) << (2 * bit)
            z |= ((by >> bit) & 1) << (2 * bit + 1)
        return z

    for r in out:
        assert r["_zvalue"] == interleave(
            bucket(r["x"], xmin, xmax), bucket(r["y"], ymin, ymax)
        )


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    )
)
def test_chunk_dedup_reassembly_invariants(spark, docs):
    """Kept text is always a prefix-order-preserving subsequence of the
    original chunking; total chunks = kept + removed; every distinct
    chunk text survives somewhere (in its min-id doc)."""
    from fhir_etl_spark.operators.dedup import chunk_dedup

    k = 3
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_tokens=k).collect()}

    def chunks_of(text):
        t = text.split(" ")
        return [" ".join(t[i : i + k]) for i in range(0, len(t), k)]

    all_chunks = set()
    survivors = set()
    for doc_id, text in enumerate(docs):
        orig = chunks_of(text)
        all_chunks.update(orig)
        row = out[doc_id]
        kept = [c for c in chunks_of(row["clean_text"]) if row["clean_text"]] if row["clean_text"] else []
        # kept chunks appear in original order as a subsequence
        it = iter(orig)
        assert all(any(c == o for o in it) for c in kept), (orig, kept)
        assert len(orig) == len(kept) + row["n_removed"]
        survivors.update(kept)
    assert all_chunks == survivors


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0, max_size=30,
        ),
        min_size=2, max_size=12,
    )
)
def test_substring_dedup_matches_local_model(spark, data):
    """The distributed ExactSubstr result equals a from-scratch local
    model (count k-grams, mark covered positions, rebuild) on arbitrary
    small corpora — including k-gram overlaps, repeats within one doc,
    and empty docs."""
    from fhir_etl_spark.operators.dedup import substring_dedup

    k = 3
    docs = [(i, " ".join(toks)) for i, toks in enumerate(data)]

    # local model
    from collections import Counter

    counts = Counter()
    for _, text in docs:
        toks = text.split()
        for i in range(len(toks) - k + 1):
            counts[tuple(toks[i : i + k])] += 1
    expected = {}
    for doc_id, text in docs:
        toks = text.split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if counts[tuple(toks[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        expected[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in substring_dedup(df, k=k).collect()
    }
    assert got == expected


def _local_substring_model(docs, k, min_span):
    """Count k-grams, mark covered positions, merge maximal covered runs,
    drop runs shorter than min_span, rebuild — the paper's removal-length
    threshold on top of the k-gram covering."""
    from collections import Counter

    counts = Counter()
    for _, text in docs:
        toks = text.split()
        for i in range(len(toks) - k + 1):
            counts[tuple(toks[i : i + k])] += 1
    expected = {}
    for doc_id, text in docs:
        toks = text.split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if counts[tuple(toks[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        # maximal consecutive runs, thresholded
        removed = set()
        run: list[int] = []
        for j in range(len(toks) + 1):
            if j in covered:
                run.append(j)
            else:
                if len(run) >= min_span:
                    removed.update(run)
                run = []
        kept = [t for j, t in enumerate(toks) if j not in removed]
        expected[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return expected


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0, max_size=30,
        ),
        min_size=2, max_size=10,
    )
)
def test_substring_dedup_span_threshold_matches_local_model(spark, data):
    """min_span_tokens (the Lee et al. removal-length threshold) against
    the local model: covered runs are merged into MAXIMAL spans first, and
    only spans ≥ the threshold are removed — so a span of exactly
    threshold−1 covered tokens survives whole (the k−1-adjacent boundary
    the window merge must get right)."""
    from fhir_etl_spark.operators.dedup import substring_dedup

    k, min_span = 3, 4
    docs = [(i, " ".join(toks)) for i, toks in enumerate(data)]
    expected = _local_substring_model(docs, k, min_span)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in substring_dedup(df, k=k, min_span_tokens=min_span).collect()
    }
    assert got == expected


def test_substring_dedup_span_threshold_boundaries(spark):
    """Deterministic k−1/boundary pins for the span threshold: a duplicated
    k-gram covers exactly k tokens (< threshold → kept whole); a duplicated
    (threshold)-token run is removed; end-ADJACENT occurrences (gap of
    exactly one position between covered intervals) must NOT merge across
    the uncovered token."""
    import pytest as _pytest

    from fhir_etl_spark.operators.dedup import substring_dedup

    k, min_span = 3, 5
    docs = [
        # "A B C" duplicated: covered run = 3 < 5 → survives at min_span=5
        (0, "x1 A B C x2"),
        (1, "y1 A B C y2"),
        # "Q R S T U" duplicated: covered run = 5 → removed at min_span=5
        (2, "p1 Q R S T U p2"),
        (3, "p3 Q R S T U p4"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in substring_dedup(df, k=k, min_span_tokens=min_span).collect()
    }
    assert got[0] == (0, "x1 A B C x2")
    assert got[1] == (0, "y1 A B C y2")
    assert got[2] == (5, "p1 p2")
    assert got[3] == (5, "p3 p4")
    # default (min_span=k) removes the short duplicated gram too
    got_default = {
        r["doc_id"]: r["n_removed"] for r in substring_dedup(df, k=k).collect()
    }
    assert got_default[0] == 3 and got_default[2] == 5
    with _pytest.raises(ValueError):
        substring_dedup(df, k=3, min_span_tokens=2)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        ndp = [i]
        for j, cb in enumerate(b, 1):
            ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
        dp = ndp
    return dp[-1]


def _del_variants(s: str, k: int) -> set[str]:
    out = {s}
    d1 = {s[:i] + s[i + 1:] for i in range(len(s))}
    out |= d1
    if k == 2:
        for d in d1:
            out |= {d[:j] + d[j + 1:] for j in range(len(d))}
    return out


@given(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=7), min_size=2, max_size=2),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=300, deadline=None)
def test_fastss_deletion_variant_completeness(pair, k):
    """The candidate-generation claim fuzzy_match_pairs rests on
    (operators/linkage.py): levenshtein(a, b) <= k implies a and b share
    a <= k-deletion variant. Checked against a local reference
    levenshtein on a dense 2-letter alphabet, where near-miss pairs are
    common — any counterexample would mean silently missed matches."""
    a, b = pair
    if _lev(a, b) <= k:
        assert _del_variants(a, k) & _del_variants(b, k), (a, b, k)


@given(n=st.integers(min_value=1, max_value=16384))
def test_xlsx_column_letters_roundtrip(n):
    """Bijective base-26 column naming: index -> letters -> index is the
    identity over the full xlsx column range (A..XFD and beyond)."""
    from fhir_etl_spark.sources.xlsx import col_to_index, index_to_col

    letters = index_to_col(n)
    assert letters.isalpha() and letters.isupper()
    assert col_to_index(letters) == n


def _xlsx_book_single_sheet(sheet_xml: str) -> bytes:
    """Minimal one-sheet workbook around raw sheet XML (the adversarial
    fixture builder shared by the fuzz + deterministic edge tests)."""
    import io
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    wb = (
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships"><Relationship Id="rId1" Type="t" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", f"<worksheet {ns}>{sheet_xml}</worksheet>")
    return buf.getvalue()


@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),  # row carries an explicit r= attribute
            st.integers(min_value=0, max_value=2),  # extra row gap (if explicit)
            st.lists(
                st.tuples(
                    # col gap before this cell; gap>0 forces an explicit ref
                    st.integers(min_value=0, max_value=760),
                    st.booleans(),  # explicit ref even when gap==0
                    st.integers(min_value=-999, max_value=999),
                ),
                max_size=5,
            ),
        ),
        min_size=0,
        max_size=5,
    )
)
@settings(max_examples=120, deadline=None)
def test_xlsx_sparse_refs_match_reference_model(rows):
    """VERDICT r07 #8: fuzz the reader against adversarial sheet layouts —
    sparse/missing r= references, column gaps (including jumps past the
    702-column two-letter boundary into AAA+ territory), explicit row
    gaps, empty rows, and empty sheets — checked cell-for-cell against an
    independent model of the spec's sequential-fallback rule (a missing
    cell ref means 'next column after the previous cell'; a missing row
    ref means 'next row')."""
    from fhir_etl_spark.sources.xlsx import index_to_col, iter_xlsx_cells

    xml_rows, expected = [], []
    implicit_row = 0
    for has_r, row_gap, cells in rows:
        implicit_row = implicit_row + 1 + (row_gap if has_r else 0)
        row_attr = f' r="{implicit_row}"' if has_r else ""
        xml_cells = []
        implicit_col = 0
        for gap, explicit, val in cells:
            explicit = explicit or gap > 0
            col = implicit_col + 1 + (gap if explicit else 0)
            implicit_col = col
            ref = f"{index_to_col(col)}{implicit_row}"
            ref_attr = f' r="{ref}"' if explicit else ""
            xml_cells.append(f"<c{ref_attr}><v>{val}</v></c>")
            expected.append(("S", implicit_row, col, ref, "n", str(val)))
        xml_rows.append(f"<row{row_attr}>{''.join(xml_cells)}</row>")
    sheet = "<sheetData>" + "".join(xml_rows) + "</sheetData>"

    got = list(iter_xlsx_cells(_xlsx_book_single_sheet(sheet)))
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lsh_bucket_keepers_matches_reference_model(spark, docs):
    """Round-8 d12 invariants, fuzzed over tiny corpora from a 4-word
    alphabet (dense collisions): (a) the verdict table is TOTAL — one
    row per doc id, including docs too short to shingle (sentinel
    buckets); (b) kept == the reference rule computed independently in
    Python off the same index rows (dropped iff some occupied bucket
    holds a smaller id); (c) every short doc is kept."""
    from fhir_etl_spark.operators.dedup import doc_band_index, lsh_bucket_keepers

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = doc_band_index(df).collect()
    got = {
        r["doc_id"]: r["kept"]
        for r in lsh_bucket_keepers(
            spark.createDataFrame(banded, "doc_id long, band int, bucket long")
        ).collect()
    }

    buckets: dict = {}
    for r in banded:
        buckets.setdefault((r["band"], r["bucket"]), set()).add(r["doc_id"])
    want = {
        i: all(i <= min(members) for members in buckets.values() if i in members)
        for i in range(len(docs))
    }
    assert got == want
    for i, words in enumerate(docs):
        if len(words) < 3:
            assert got[i] is True  # sentinel singleton -> kept


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba"]), min_size=0, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba"]),
        st.sampled_from(["a", "b", "ab", "ba"]),
    ),
)
@settings(max_examples=200, deadline=None)
def test_bpe_merge_replace_trick_equals_greedy_fold(syms, pair):
    """The identity the t13 BPE oracle rests on, fuzzed: a non-overlapping
    left-to-right ``replace`` on the wrapped-separator encoding
    ``|s1||s2||…|`` equals the greedy left-to-right pair-merge fold, for
    ALL symbol sequences and merge pairs — including the adversarial
    self-pair runs (``a a a``), composite symbols that embed the pair's
    text (``ab``), and adjacent matches sharing no boundary chars. The
    reference fold is implemented independently here; DuckDB executes the
    replace exactly as the generated oracle does."""
    import duckdb

    left, right = pair

    # independent greedy fold (the _merge_pair_expr contract)
    folded: list[str] = []
    for s in syms:
        if folded and folded[-1] == left and s == right:
            folded[-1] = left + right
        else:
            folded.append(s)

    wrapped = "|" + "||".join(syms) + "|" if syms else "||"
    got = duckdb.connect().execute(
        "SELECT replace(?, ?, ?)",
        [wrapped, f"|{left}||{right}|", f"|{left}{right}|"],
    ).fetchone()[0]
    want = "|" + "||".join(folded) + "|" if folded else "||"
    assert got == want, (syms, pair, got, want)


def test_xlsx_empty_sheet_and_three_letter_columns():
    """Deterministic edges from the same verdict item: (a) empty
    sheetData — both the <sheetData/> self-closed and the open-close
    form — parses to zero cells without raising; (b) cells addressed at
    and past column 702 (ZZ -> AAA boundary) keep exact positions, and
    an implicit cell after AAA crosses into AAB."""
    from fhir_etl_spark.sources.xlsx import col_to_index, iter_xlsx_cells

    assert list(iter_xlsx_cells(_xlsx_book_single_sheet("<sheetData/>"))) == []
    assert (
        list(iter_xlsx_cells(_xlsx_book_single_sheet("<sheetData></sheetData>")))
        == []
    )
    # a row element with no cells, between populated rows
    sheet = (
        "<sheetData>"
        '<row r="1"><c r="ZZ1"><v>1</v></c><c><v>2</v></c></row>'
        "<row/>"
        '<row><c r="AAA3"><v>3</v></c><c><v>4</v></c></row>'
        "</sheetData>"
    )
    got = list(iter_xlsx_cells(_xlsx_book_single_sheet(sheet)))
    assert got == [
        ("S", 1, col_to_index("ZZ"), "ZZ1", "n", "1"),
        ("S", 1, col_to_index("AAA"), "AAA1", "n", "2"),  # implicit past ZZ
        ("S", 3, col_to_index("AAA"), "AAA3", "n", "3"),
        ("S", 3, col_to_index("AAB"), "AAB3", "n", "4"),
    ]
    assert col_to_index("ZZ") == 702 and col_to_index("AAA") == 703


@given(
    bits=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_hilbert_reference_walk_properties(bits, data):
    """The pure-Python twin of hilbert_key's unrolled walk (same rule,
    same constants) is a bijection with unit steps at EVERY bit width —
    so the Spark expression, already pinned equal to this walk at
    bits=4 over the full grid (test_layout), inherits the property
    across widths."""
    n = 1 << bits

    def walk(x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    index = {(x, y): walk(x, y) for x in range(n) for y in range(n)}
    assert sorted(index.values()) == list(range(n * n))
    cells = sorted(index, key=lambda c: index[c])
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1
        for a, b in zip(cells, cells[1:])
    )
    # spot-check the Spark-exposed SQL oracle constants agree: the level
    # contribution for a random cell equals the walk
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    assert index[(x, y)] == walk(x, y)


# --- round-8 continuation ops: fold/quantization properties -----------------

_holt_series = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(series=_holt_series)
def test_holt_fold_matches_local_replay(spark, series):
    """The w10 fold == a plain Python replay of the recurrence on ANY
    series: identical IEEE op sequence, so equality is exact (==)."""
    from fhir_etl_spark.operators.timeseries import holt_smoothing

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(series)], "k int, t int, v double"
    )
    got = {
        r["t"]: (r["level"], r["trend"], r["forecast"])
        for r in holt_smoothing(df, ["k"], ["t"], "v", alpha=0.25, beta=0.5).collect()
    }
    lvl = trd = None
    for i, v in enumerate(series):
        if lvl is None:
            lvl, trd = v, 0.0
        else:
            new_l = 0.25 * v + 0.75 * (lvl + trd)
            trd = 0.5 * (new_l - lvl) + 0.5 * trd
            lvl = new_l
        assert got[i] == (lvl, trd, lvl + trd), (i, got[i], (lvl, trd))


_ols_series = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False,
              allow_infinity=False).map(lambda x: round(x, 2)),
    min_size=2,
    max_size=20,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(series=_ols_series)
def test_ols_trend_matches_integer_model(spark, series):
    """w11's slope/intercept == an exact integer reimplementation on ANY
    2-dp series (BIGINT sums, truncating division toward zero)."""
    from fhir_etl_spark.operators.timeseries import ols_trend

    df = spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(series)],
        "k int, t int, v double",
    )
    r = ols_trend(df, ["k"], ["t"], "v").collect()[0]
    ys = [int(round(v * 100)) for v in series]
    xs = list(range(1, len(series) + 1))
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slope = trunc_div((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
    intercept = trunc_div(sy * 1_000_000 - slope * sx, n)
    assert (r["slope_micro"], r["intercept_micro"]) == (slope, intercept)


_pq_corpus = st.lists(
    st.lists(
        st.floats(min_value=-2, max_value=2, allow_nan=False,
                  allow_infinity=False),
        min_size=8,
        max_size=8,
    ),
    min_size=3,
    max_size=12,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_pq_corpus)
def test_pq_adc_self_distance_is_minimum(spark, vecs):
    """ADC(q, q) = Σ_s min_w ‖q_s − w‖² ≤ ADC(q, x) for every x — the
    self-distance optimality holds on ARBITRARY corpora (any seeds, any
    cluster collapse), because the encoder's argmin is per subspace."""
    from fhir_etl_spark.operators.similarity import pq_adc_topk, pq_train_encode

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    codes, cb = pq_train_encode(df, dim=8, m=2, sub_k=4, n_iterations=2)
    q0 = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    got = sorted(
        pq_adc_topk(codes, cb, q0, k=len(vecs), m=2, sub_len=4, sub_k=4).collect(),
        key=lambda r: r["rank"],
    )
    self_adc = next(r["adc_micro"] for r in got if r["vec_id"] == 0)
    assert self_adc == got[0]["adc_micro"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    hists=st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=4, max_size=4),
        min_size=1,
        max_size=8,
    )
)
def test_scene_cuts_matches_local_model(spark, hists):
    """scene_cuts' L1 deltas and verdicts == a local integer replay on
    ANY histogram sequence."""
    from fhir_etl_spark.operators.multimodal import scene_cuts

    df = spark.createDataFrame(
        [(1, i, [int(x) for x in h]) for i, h in enumerate(hists)],
        "clip int, frame_index int, hist array<bigint>",
    )
    got = {
        r["frame_index"]: (r["l1_delta"], r["is_cut"])
        for r in scene_cuts(df, "clip", "frame_index").collect()
    }
    for i, h in enumerate(hists):
        if i == 0:
            assert got[i] == (None, False)
        else:
            l1 = sum(abs(a - b) for a, b in zip(h, hists[i - 1]))
            assert got[i] == (l1, 2 * l1 > sum(h))


_ipc_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-2**40, max_value=2**40)),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e6, max_value=1e6)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.booleans()),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_ipc_rows)
def test_arrow_ipc_roundtrip_arbitrary_typed_rows(spark, rows, tmp_path_factory):
    """Arbitrary (nullable long, double, string, bool) rows survive the
    IPC write → binaryFile → mapInArrow read-back exactly, including
    null masks and empty strings."""
    import pyarrow as pa

    from fhir_etl_spark.sources.arrow_ipc import read_arrow_ipc, write_ipc_file

    tmp = tmp_path_factory.mktemp("ipcprop")
    table = pa.table(
        {
            "i": pa.array([r[0] for r in rows], pa.int64()),
            "d": pa.array([r[1] for r in rows], pa.float64()),
            "s": pa.array([r[2] for r in rows]
                          if any(r[2] is not None for r in rows)
                          else [None] * len(rows), pa.string()),
            "b": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    write_ipc_file(str(tmp / "t.arrow"), table)
    got = read_arrow_ipc(
        spark, f"{tmp}/t.arrow", "i bigint, d double, s string, b boolean"
    ).collect()
    back = sorted(
        ((r["i"], r["d"], r["s"], r["b"]) for r in got),
        key=lambda t: (repr(t)),
    )
    want = sorted(rows, key=lambda t: (repr(tuple(t))))
    assert [tuple(w) for w in want] == back


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    chunks=st.lists(
        st.integers(min_value=1, max_value=40), min_size=2, max_size=6
    )
)
def test_compaction_preserves_arbitrary_commit_sequences(
    spark, chunks, tmp_path_factory
):
    """Any append sequence compacts to the identical row multiset with
    strictly fewer (or equal) files and intact time travel."""
    from fhir_etl_spark.sinks.versioned import (
        compact_snapshot,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path_factory.mktemp("cprop") / "t")
    lo = 0
    for i, n in enumerate(chunks):
        write_snapshot(
            spark.range(lo, lo + n).repartition(2),
            table,
            mode="append" if i else "overwrite",
        )
        lo += n
    before = sorted(r["id"] for r in read_snapshot(spark, table).collect())
    stats = compact_snapshot(spark, table, target_file_bytes=64 * 1024 * 1024)
    after = sorted(
        r["id"] for r in read_snapshot(spark, table, stats["version"]).collect()
    )
    assert after == before == list(range(lo))
    assert stats["files_after"] <= stats["files_before"]
    # version-0 time travel still returns exactly the first chunk
    assert read_snapshot(spark, table, 0).count() == chunks[0]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-2, max_value=2, allow_nan=False,
                      allow_infinity=False),
            min_size=40, max_size=40,
        ),
        min_size=2, max_size=8,
    )
)
def test_binary_hamming_matches_sign_model(spark, vecs):
    """v13's Hamming == the number of positions where the sign tests
    disagree, on ARBITRARY vectors (incl. zeros, which are 'not
    positive' on both sides of the packing)."""
    from fhir_etl_spark.operators.similarity import binary_hamming_topk

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    got = {
        r["vec_id"]: r["hamming"]
        for r in binary_hamming_topk(df, q, k=len(vecs), dim=40).collect()
    }
    q0 = vecs[0]
    for i, v in enumerate(vecs):
        want = sum((a > 0) != (b > 0) for a, b in zip(q0, v))
        assert got[i] == want, (i, got[i], want)


# --- t24 extraction properties: arbitrary tag soup (round 10) --------------

_TAGS = ["p", "div", "li", "br", "span", "b", "a", "script", "style", "h2"]
_soup_piece = st.one_of(
    st.sampled_from(
        [f"<{t}>" for t in _TAGS]
        + [f"</{t}>" for t in _TAGS]
        + ['<a href="/x">', "<!-- c -->", "<script>var z=1;</script>"]
    ),
    st.text(
        alphabet="abc defg hij \t\n&<",  # words, whitespace, loose & and <
        min_size=0,
        max_size=30,
    ),
)
html_batches = st.lists(
    st.lists(_soup_piece, min_size=0, max_size=25).map("".join),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pages=html_batches)
def test_extract_invariants_on_arbitrary_tag_soup(spark, pages):
    """Structural invariants that must hold for ANY input, including
    unclosed/mismatched/nested tags: counts are consistent, the
    extracted text contains no COMPLETE tags from the vocabulary, no
    script payload survives, and n_words equals the whitespace word
    count of main_text."""
    from fhir_etl_spark.operators.html import extract_main_content

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "doc_id long, html string"
    )
    rows = extract_main_content(df).collect()
    assert len(rows) == len(pages)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_blocks"]
        words = [w for w in r["main_text"].split() if w]
        # main_text words are newline/space-joined kept-block words.
        # Counts are taken BEFORE entity unescape (by design — both
        # engines count identically), and "&nbsp;" decodes to a space,
        # so the equality is only asserted on entity-free outputs.
        if "&" not in r["main_text"]:
            assert r["n_words"] == len(words) or r["main_text"] == ""
        if r["main_text"] == "":
            assert r["n_words"] == 0 and r["n_kept"] == 0
        low = r["main_text"].lower()
        for t in _TAGS:
            assert f"<{t}>" not in low and f"</{t}>" not in low
        assert "var z=1" not in low
