"""Time one registry query with the bench's exact methodology (warm JVM
on q1, clearCache before each sample, best-of-2, noop sink) — the
round's isolated A/B harness.

Usage: python tools/time_one.py <name> [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from fhir_etl_spark.queries import all_queries  # noqa: E402
from fhir_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    spark = get_spark("time_one")
    spark.sparkContext.setLogLevel("ERROR")
    registry["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in sys.argv[1:]:
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time_one:{name}")
            start = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - start, 3))
        print(f"{name}: best {min(samples)} samples {samples}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
