"""Pin the plan-audit tooling itself (VERDICT r06 "What's wrong" #1):
the `python` detector must see Arrow/Pandas physical nodes (MapInPandas
et al.), not just row-UDF "Python" spellings. Without this, a Python leak
into a relational plan would audit as `python=no` and PLANS.md would lie.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.plan_audit import _PYTHON_NODE, audit  # noqa: E402

from fhir_etl_spark.queries import all_queries  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_detector_matches_every_python_node_spelling():
    for node in [
        "ArrowEvalPython [f(x)#1]",
        "BatchEvalPython [g(y)#2]",
        "MapInPandas decode(payload)#3",
        "FlatMapGroupsInPandas [k#4], fit(v)#5",
        "FlatMapCoGroupsInPandas [k#6]",
        "PythonMapInArrow f(batch)#7",
        "AggregateInPandas [k#8]",
        "WindowInPandas [k#9]",
        "MapInArrow f(batch)#10",
    ]:
        assert _PYTHON_NODE.search(node), node


def test_detector_ignores_jvm_only_nodes():
    jvm_plan = (
        "TakeOrderedAndProject\n+- HashAggregate\n  +- Exchange hashpartitioning\n"
        "    +- BroadcastHashJoin\n      +- Scan parquet [l_orderkey#1]"
    )
    assert not _PYTHON_NODE.search(jvm_plan)


def test_m2_audits_python_yes(spark):
    """The codec tier is MapInPandas by design — the audit must say so."""
    a = audit(all_queries()["m2_image_decode"].fn(spark, SF))
    assert a["python"] == "yes"


def test_q1_audits_python_no(spark):
    """Relational plans are JVM-only; python=yes here is a regression."""
    a = audit(all_queries()["q1_pricing_summary"].fn(spark, SF))
    assert a["python"] == "no"
