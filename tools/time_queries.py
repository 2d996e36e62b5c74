"""Isolated per-query timing with the bench's exact methodology (noop
sink, best-of-2 full executions, clearCache between samples, get_spark
session, one warm query first) — for before/after A/Bs during the
optimization rounds without paying a full headline run.

Usage: python tools/time_queries.py <name> [name ...]   (sf from
$SPARK_GRAFT_SF_DIR, default sf0.1). Prints one `name sec` line each
plus a total.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from fhir_etl_spark.queries import all_queries  # noqa: E402
from fhir_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    registry["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    total = 0.0
    for name in names:
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time:{name}")
            start = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - start)
        best = min(samples)
        total += best
        print(f"{name} {best:.3f}  (samples: {[round(s,3) for s in samples]})")
    print(f"TOTAL {total:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
