"""Reference-shaped pandas baseline for the fhirize path.

Reproduces the PER-ROW WORK PATTERN of the reference pipeline (without
copying its code): `iterrows` over the sample table
(oneKg_fhirizer.py:243), per-row namespace re-instantiation
(oneKg_fhirizer.py:65), uuid5 minting per id/reference (utils.py:44-55),
nested-dict resource construction (oneKg_fhirizer.py:64-108), and the
serialize→parse→serialize round-trip (oneKg_fhirizer.py:108,248;
utils.py:220-228). The engine's `bench.py fhirize_rows_per_sec` measures
the same logical work as one Spark plan; this script supplies the
single-thread pandas floor it is compared against in BASELINE.md.

Usage: python tools/pandas_baseline.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
import uuid


def synthetic_frame(n: int):
    import pandas as pd

    return pd.DataFrame(
        {
            "Sample": [f"HG{i}" for i in range(n)],
            "Gender": [("male", "female", None)[i % 3] for i in range(n)],
            "Population Description": [f"Population {i % 26}" for i in range(n)],
            "Population": ["GBR"] * n,
            "DNA Source from Coriell": [("LCL" if i % 5 == 0 else None) for i in range(n)],
            "Main project LC platform": [("ILLUMINA" if i % 2 == 0 else None) for i in range(n)],
        }
    )


def run(n_rows: int) -> float:
    import pandas as pd

    df = synthetic_frame(n_rows)
    out = []
    start = time.perf_counter()
    for _, row in df.iterrows():  # the reference's row-at-a-time loop
        # per-row namespace re-instantiation, as the reference does
        ns = uuid.uuid3(uuid.NAMESPACE_DNS, "example.org")
        sample = str(row["Sample"])
        pid = str(uuid.uuid5(ns, f"P/Patient/sys|{sample}"))
        patient = {
            "resourceType": "Patient",
            "id": pid,
            "identifier": [{"system": "https://sys", "value": sample}],
            "extension": [],
        }
        if pd.notna(row["Gender"]):
            patient["gender"] = row["Gender"]
            patient["extension"].append(
                {"url": "https://ext/sex", "valueString": row["Gender"]}
            )
        patient["extension"].append(
            {
                "url": "https://ext/population",
                "valueString": row["Population Description"],
            }
        )
        if not patient["extension"]:
            del patient["extension"]
        # serialize → parse → serialize, as the reference round-trips
        blob = json.dumps(patient, indent=4)
        parsed = json.loads(blob)
        out.append(json.dumps(parsed))
    elapsed = time.perf_counter() - start
    assert len(out) == n_rows
    return n_rows / elapsed


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rate = run(n)
    print(json.dumps({"pandas_fhirize_rows_per_sec": round(rate), "n_rows": n}))
