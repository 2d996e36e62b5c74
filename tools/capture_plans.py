"""Capture ``.explain("formatted")`` for named registry queries into
``plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt`` (default r13 — the
optimization round's before/after plan evidence; the judge reads these
instead of running Spark).

Usage: python tools/capture_plans.py <tag> <name> [name ...]
       python tools/capture_plans.py <tag> --headline   (every bench query)

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) under the
same get_spark() session the bench uses, so the plan shapes match what
the bench times. Queries whose construction runs bounded driver work
(centroid collects, store warms, persist barriers) execute that work
here too — capture is about plan truth, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from fhir_etl_spark.queries import all_queries  # noqa: E402
from fhir_etl_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    if names == ["--headline"]:
        import importlib

        bench = importlib.import_module("bench")
        names = list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange -> {path}")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
