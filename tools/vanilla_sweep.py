"""Pre-driver hardening sweep: run EVERY registered query against its DuckDB
oracle under a VANILLA SparkSession (no get_spark() configs), mirroring the
driver's correctness gate. Round 1 showed local test-session green does not
imply driver green (session confs, loose numeric compare) — this closes both
gaps: bare builder + tests.oracle_harness strict compare.

Usage: python tools/vanilla_sweep.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from fhir_etl_spark.queries import all_queries  # noqa: E402
from tests.conftest import make_duckdb  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

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
    t0 = time.time()
    for i, name in enumerate(names):
        qd = queries[name]
        t = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                assert len(df.columns) > 0 and n >= 0
                rows_only += 1
                status = f"rows-only ({n} rows)"
            else:
                compare(df, con, qd.oracle, name=name)
                status = "ok"
        except Exception:
            failed.append(name)
            status = "FAIL"
            traceback.print_exc()
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t:.1f}s)", flush=True)

    print(
        f"\n{len(names) - len(failed)}/{len(names)} green "
        f"({rows_only} rows-only) in {time.time() - t0:.0f}s"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
