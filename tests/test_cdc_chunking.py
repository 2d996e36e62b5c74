"""d15 content-defined chunking: the resync property (the whole reason
CDC exists), the total output contract, and reconstruction invariants.

Reference behavior being re-expressed: the LBFS/FastCDC boundary rule —
cut where a local rolling fingerprint hits 0 mod D — applied at token
grain, with chunk_dedup's min-id keeper policy on top (same policy d9
pins for fixed-width chunks).
"""

from __future__ import annotations

from fhir_etl_spark.operators.dedup import cdc_chunk_dedup, chunk_dedup

# 120 distinct tokens: no accidental chunk collisions between unrelated
# positions, so every dedup'd chunk below is a true aligned match.
_T = " ".join(f"w{i:03d}" for i in range(120))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_resyncs_after_insertion(spark):
    """Insert one token at the FRONT of a near-copy: content-defined
    boundaries resync at the first cut after the edit, so the shared
    tail still collapses — while fixed-width chunks all shift by one
    token and dedup nothing. This is the operator's reason to exist."""
    docs = _docs(spark, [(1, _T), (2, "zzz " + _T)])

    cdc = {r["doc_id"]: r for r in cdc_chunk_dedup(docs).collect()}
    # doc 2: every chunk after the resync point is an exact copy of a
    # doc-1 chunk; at most the chunks overlapping the insertion survive
    assert cdc[2]["n_removed"] >= cdc[2]["n_chunks"] - 2
    assert cdc[2]["n_removed"] > 0
    # doc 1 is the min-id keeper everywhere
    assert cdc[1]["n_removed"] == 0

    fixed = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_tokens=10).collect()}
    # the one-token shift misaligns every 10-token window (tokens are
    # all distinct) — fixed-width removes nothing from doc 2
    assert fixed[2]["n_removed"] == 0


def test_cdc_total_contract_and_reconstruction(spark):
    """Every input doc appears exactly once; a corpus with no duplicate
    chunks reassembles to its own normalized text; empty docs read back
    ('', 0, 0) instead of vanishing (the d12 sentinel lesson)."""
    docs = _docs(spark, [(1, _T), (2, ""), (3, "one two")])
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == _T  # chunks concatenate back losslessly
    assert out[2]["clean_text"] == "" and out[2]["n_chunks"] == 0
    # short doc (< w+1 tokens): single whole-text chunk
    assert out[3]["n_chunks"] == 1 and out[3]["clean_text"] == "one two"


def test_cdc_chunk_length_tracks_divisor(spark):
    """Expected chunk length is ~divisor tokens (geometric boundary
    probability 1/divisor) — sanity-bound the mean so a broken modulus
    (always-cut or never-cut) fails loudly."""
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(500)))])
    row = cdc_chunk_dedup(docs, divisor=8).collect()[0]
    mean_len = 500 / row["n_chunks"]
    assert 2.0 <= mean_len <= 40.0
