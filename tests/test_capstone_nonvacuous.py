"""Non-vacuousness pins for the composed pipelines.

Round-11 lesson: c5 shipped with a GREEN value oracle that verified
nothing — its classifier gate (the frozen t22 head, which collapses to
always-negative on the shared-vocabulary synthetic corpus; see
functions/ft_weights.py) emptied the pipeline at every SF, and both
engines agreed on the empty result. A value oracle proves the engines
compute the same thing, not that the thing is non-trivial; for
multi-stage pipelines whose stages can silently starve downstream
stages, the row count itself needs a pin.

These tests assert every composed c-tier pipeline produces real output
at sf0.001 (the smallest fixture), so a recipe change that re-empties
one fails the suite instead of sailing through a vacuous oracle match.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# Pipelines and the minimum rows they must yield at sf0.001. The floors
# are deliberately loose (1 = "not empty") except where the recipe
# makes a tighter bound structural.
_PIPELINES = (
    ("c1_curation_pipeline", 1),
    ("c2_web_curation_pipeline", 1),
    ("c3_line_curation_pipeline", 1),
    ("c4_fuzzy_dedup_pipeline", 1),
    ("c5_capstone_curation", 1),
    ("c5b_capstone_learned_gate", 1),
    ("c6_rag_pipeline", 1),
)


@pytest.mark.parametrize("name,min_rows", _PIPELINES)
def test_composed_pipeline_is_nonvacuous(spark, name, min_rows):
    from fhir_etl_spark.queries import all_queries

    q = all_queries()[name]
    n = q.fn(spark, SF).count()
    assert n >= min_rows, (
        f"{name} returned {n} rows at sf0.001 — the oracle may still "
        "match (both engines can agree on an empty result), but an "
        "empty pipeline verifies nothing; a stage is starving its "
        "consumers"
    )
