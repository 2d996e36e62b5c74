"""Pre-driver hardening sweep: run EVERY registered query against its DuckDB
oracle under a VANILLA SparkSession (no get_spark() configs), mirroring the
driver's correctness gate. Round 1 showed local test-session green does not
imply driver green (session confs, loose numeric compare) — this closes both
gaps: bare builder + tests.oracle_harness strict compare.

Usage: python tools/vanilla_sweep.py [sf_dir] [name_prefix ...]
       python tools/vanilla_sweep.py --json SWEEP_r10.json [sf_dir]

``--json PATH`` additionally writes the machine-readable artifact the
round-9 verdict asked for (#3): the driver's rotation window covers 50
names, so queries sorting after it have no CORRECTNESS row — the
committed artifact is the hard per-round signal for those. Schema:
{"sf_dir": ..., "registry_total": N, "green": N, "queries":
 {name: {"status": "ok"|"rows_only"|"fail", "wall_sec": s[, "rows": n]}}}.
A contract test (tests/test_sweep_artifact.py) asserts the newest
SWEEP_r*.json matches the CURRENT registry name-for-name, so adding a
query without re-running the sweep fails the suite.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from fhir_etl_spark.queries import all_queries  # noqa: E402
from tests.conftest import make_duckdb  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    prefixes = tuple(argv[1:])
    if json_out and prefixes:
        raise SystemExit("--json requires a FULL sweep (no name prefixes)")

    # Vanilla, like the driver: master + app name only. No shuffle-partition
    # tuning, no nanosAsLong (load_tables must set what it needs itself).
    spark = (
        SparkSession.builder.master("local[32]").appName("vanilla_sweep").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = make_duckdb(sf_dir)

    queries = all_queries()
    names = sorted(queries)
    if prefixes:
        names = [n for n in names if n.startswith(prefixes)]

    failed: list[str] = []
    rows_only = 0
    records: dict[str, dict] = {}
    t0 = time.time()
    for i, name in enumerate(names):
        qd = queries[name]
        t = time.time()
        rec: dict = {}
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                assert len(df.columns) > 0 and n >= 0
                rows_only += 1
                status = f"rows-only ({n} rows)"
                rec = {"status": "rows_only", "rows": n}
            else:
                compare(df, con, qd.oracle, name=name)
                status = "ok"
                rec = {"status": "ok"}
        except Exception:
            failed.append(name)
            status = "FAIL"
            rec = {"status": "fail"}
            traceback.print_exc()
        rec["wall_sec"] = round(time.time() - t, 2)
        records[name] = rec
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t:.1f}s)", flush=True)

    print(
        f"\n{len(names) - len(failed)}/{len(names)} green "
        f"({rows_only} rows-only) in {time.time() - t0:.0f}s"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "registry_total": len(names),
                    "green": len(names) - len(failed),
                    "rows_only": rows_only,
                    "total_wall_sec": round(time.time() - t0, 1),
                    "queries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
