"""ADVICE r12 regression tests: the c5 WARC staging read-back must be
manifest-driven. n_files scales with the session's parallelism while
the staging dir persists in /tmp, so an empty modulo residue in the
CURRENT run must not resurrect a stale part file left by a prior run
with a different n_files/core count (duplicate doc_ids), and a missing
residue file must not surface as a silently-dropped error row."""

from __future__ import annotations

import os
import shutil


def test_stale_residue_file_is_not_read_back(spark):
    from fhir_etl_spark.queries.capstone import (
        _c5_warc_file_count,
        _stage_and_scan_warc,
    )
    from fhir_etl_spark.sources.warc import http_response_record, write_warc

    sf_dir = "/any/where/sf_advice_r13_stale"
    out_dir = "/tmp/fhir_etl_spark_warc_c5/sf_advice_r13_stale"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    try:
        # a prior run's leftover: residue 0 holds doc 999
        stale = write_warc(
            [
                http_response_record(
                    "http://corpus.local/999",
                    b"<p>stale</p>",
                    record_id="doc-999",
                )
            ],
            gzip_members=True,
        )
        with open(f"{out_dir}/part-0000.warc.gz", "wb") as f:
            f.write(stale)

        # every current doc lands in residue 1 -> residue 0 stays empty
        # THIS run, exactly the shape that used to read the stale file
        n = _c5_warc_file_count(spark)
        ids = [1, 1 + n, 1 + 2 * n]
        pages = spark.createDataFrame(
            [(i, f"<p>doc {i}</p>") for i in ids], "doc_id long, html string"
        )
        got = sorted(
            r["doc_id"]
            for r in _stage_and_scan_warc(spark, sf_dir, pages).collect()
        )
        assert got == ids, got  # doc 999 must NOT ride along
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
