"""CLI + typed-schema round-trip + scale-mode membership table."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def onekg_meta(spark, tmp_path_factory):
    """A small end-to-end 1KG run through the CLI code path."""
    from fhir_etl_spark import cli

    staged = tmp_path_factory.mktemp("cli_staged")
    tsv = staged / "sample_info.tsv"
    tsv.write_text(
        "Sample\tGender\tPopulation Description\tPopulation\tDNA Source from Coriell\tMain project LC platform\n"
        "HG00096\tmale\tBritish\tGBR\t\tILLUMINA\n"
        "HG00097\tfemale\tBritish\tGBR\tLCL\t\n"
    )
    listing = staged / "listing.json"
    listing.write_text(
        json.dumps(
            {
                "ALL.chr1.x.vcf.gz": {"size": 100, "mdtm": "213 20140912142107"},
                "README": {"size": 1, "mdtm": "213 20140101000000"},
            }
        )
    )
    header = staged / "header"
    header.write_text("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tHG00096\tZZZ\n")
    meta = tmp_path_factory.mktemp("cli_meta")
    rc = cli.main(
        [
            "transform",
            "-p",
            "1kgenomes",
            "--meta-dir",
            str(meta),
            "--sample-info",
            str(tsv),
            "--ftp-listing",
            str(listing),
            "--vcf-header",
            str(header),
        ]
    )
    assert rc == 0
    return meta


def test_cli_transform_then_validate(onekg_meta):
    from fhir_etl_spark import cli

    assert cli.main(["validate", "--path", str(onekg_meta)]) == 0


def test_structural_roundtrip_on_pipeline_output(spark, onekg_meta):
    from fhir_etl_spark.operators.validate import structural_roundtrip

    for rtype in ["Patient", "Specimen", "ResearchSubject", "ResearchStudy", "Group", "DocumentReference"]:
        out = structural_roundtrip(spark, f"{onekg_meta}/{rtype}.ndjson", rtype)
        rows = out.collect()
        assert rows and all(r["structurally_valid"] for r in rows), rtype


def test_structural_roundtrip_catches_shape_drift(spark, tmp_path):
    bad = tmp_path / "Patient.ndjson"
    bad.write_text('{"resourceType": "Group", "id": "x"}\n')
    from fhir_etl_spark.operators.validate import structural_roundtrip

    rows = structural_roundtrip(spark, str(bad), "Patient").collect()
    assert not rows[0]["structurally_valid"]


def test_membership_table_scale_mode(spark, tmp_path):
    from fhir_etl_spark.operators.membership import write_membership_table

    members = spark.createDataFrame([("u1",), ("u2",)], "specimen_id string")
    out = write_membership_table(members, "g-1", str(tmp_path / "membership"))
    back = spark.read.parquet(out)
    rows = {(r["group_id"], r["member_ref"]) for r in back.collect()}
    assert rows == {("g-1", "Specimen/u1"), ("g-1", "Specimen/u2")}