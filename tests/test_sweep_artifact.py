"""Contract test for the per-round sweep artifact (VERDICT r09 #3).

The driver's CORRECTNESS window rotates over 50 names; everything
sorting after it has no driver row, so the committed SWEEP_r{N}.json
(written by ``tools/vanilla_sweep.py --json``) is the hard correctness
signal for those queries. This test makes the artifact impossible to
leave stale: the NEWEST SWEEP_r*.json must name exactly the current
registry (adding or renaming a query without re-running the sweep
fails the suite) and must be fully green.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_sweep() -> tuple[str, dict]:
    paths = glob.glob(os.path.join(REPO, "SWEEP_r*.json"))
    assert paths, (
        "no SWEEP_r*.json at repo root — run "
        "`python tools/vanilla_sweep.py --json SWEEP_r<N>.json` and commit it"
    )
    def round_no(p: str) -> int:
        m = re.search(r"SWEEP_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    newest = max(paths, key=round_no)
    with open(newest) as f:
        return newest, json.load(f)


def test_sweep_artifact_matches_registry():
    from fhir_etl_spark.queries import all_queries

    path, art = _newest_sweep()
    registry = set(all_queries())
    swept = set(art["queries"])
    missing = sorted(registry - swept)
    extra = sorted(swept - registry)
    assert not missing and not extra, (
        f"{os.path.basename(path)} is STALE vs the registry — "
        f"missing={missing[:5]} extra={extra[:5]}; re-run "
        "`python tools/vanilla_sweep.py --json` and commit the refresh"
    )
    assert art["registry_total"] == len(registry)


def test_sweep_artifact_is_green():
    path, art = _newest_sweep()
    bad = {
        n: r["status"]
        for n, r in art["queries"].items()
        if r["status"] not in ("ok", "rows_only")
    }
    assert not bad, f"{os.path.basename(path)} records failures: {bad}"
    assert art["green"] == art["registry_total"]
    # rows_only stays the small, known-by-nature set — a value oracle
    # silently dropping to rows-only would otherwise pass unnoticed
    rows_only = sorted(
        n for n, r in art["queries"].items() if r["status"] == "rows_only"
    )
    from fhir_etl_spark.queries import all_queries

    expected = sorted(n for n, qd in all_queries().items() if qd.oracle is None)
    assert rows_only == expected


def test_sweep_artifact_records_walls():
    _, art = _newest_sweep()
    assert all(
        isinstance(r.get("wall_sec"), (int, float)) and r["wall_sec"] >= 0
        for r in art["queries"].values()
    )
