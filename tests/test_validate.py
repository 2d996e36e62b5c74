"""T4 (SURVEY.md §5.2): validate-summary parity on the golden META dirs —
the counts documented in the reference README (README.md:35,38)."""

from __future__ import annotations

import os

import pytest

from fhir_etl_spark.operators.validate import validate_dir

ONEKG_GOLDEN = "/root/reference/fhir_etl/oneKgenomes/META"
GTEX_GOLDEN = "/root/reference/fhir_etl/GTEx/META"


@pytest.mark.skipif(not os.path.isdir(ONEKG_GOLDEN), reason="no reference checkout")
def test_validate_summary_onekg_golden(spark):
    result = validate_dir(spark, ONEKG_GOLDEN)
    assert result.summary == {
        "DocumentReference": 48,
        "Specimen": 3500,
        "ResearchStudy": 1,
        "ResearchSubject": 3500,
        "Group": 1,
        "Patient": 3500,
    }
    assert result.ok, result.errors.limit(5).collect()


@pytest.mark.skipif(not os.path.isdir(GTEX_GOLDEN), reason="no reference checkout")
def test_validate_summary_gtex_golden(spark):
    result = validate_dir(spark, GTEX_GOLDEN)
    # Specimen.ndjson stripped upstream (.MISSING_LARGE_BLOBS); remaining
    # counts match README.md:38
    assert result.summary == {
        "DocumentReference": 49,
        "ResearchStudy": 1,
        "ResearchSubject": 980,
        "Group": 1,
        "Patient": 980,
    }
    assert result.ok


def test_validate_catches_errors(spark, tmp_path):
    bad = tmp_path / "Patient.ndjson"
    bad.write_text(
        "\n".join(
            [
                '{"resourceType": "Patient", "id": "fb96f2a9-8ec2-5784-ba62-16f168155434", "identifier": [{"value": "ok"}]}',
                '{"resourceType": "Patient", "id": "not-a-uuid", "identifier": [{"value": "x"}]}',
                '{"resourceType": "Banana", "id": "fb96f2a9-8ec2-5784-ba62-16f168155434"}',
                "this is not json",
                '{"resourceType": "DocumentReference", "id": "fb96f2a9-8ec2-5784-ba62-16f168155434", "status": "bogus", "content": [{"attachment": {"url": "x"}}]}',
            ]
        )
    )
    result = validate_dir(spark, str(tmp_path))
    assert result.summary == {"Patient": 1}
    errors = {r["error"] for r in result.errors.collect()}
    assert errors == {
        "id_not_uuid5",
        "invalid_resource_type:Banana",
        "parse_error_or_missing_resourceType",
        "DocumentReference.status_enum",
    }