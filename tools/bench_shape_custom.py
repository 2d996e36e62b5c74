"""Ad-hoc sf10-shape A/B runs during the optimization rounds: same
build + measure loop as tools/bench_sf10.py (shared run_shape_bench —
wall + per-query shuffle bytes from the REST status API) but over an
argv-chosen query list, so a single rewritten operator can be measured
at the 100x shape without paying the whole tier.

Usage: python tools/bench_shape_custom.py <name> [name ...] > out.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sf1 import REPO, WARM_STORES, run_shape_bench  # noqa: E402

CACHE = os.path.join(REPO, ".scale_cache", "sf10")

if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_shape_bench(
        queries=names,
        floors={},
        cache=CACHE,
        metric="sf10_shape_custom",
        sf_equiv=10.0,
        replicas=100,
        rotate_embeddings=True,
        app_name="bench_shape_custom",
        warm=tuple(w for w in WARM_STORES if w in names),
    )
