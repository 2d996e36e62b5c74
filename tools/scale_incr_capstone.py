"""Measure the incremental capstone's O(epoch) claim at the sf10 shape.

The round-12 incremental capstone (streaming/capstone.py) maintains c5's
curated corpus as merge-on-read state; its correctness (stream-vs-batch
row equality, crash replay, commit bounds) is pinned by
tests/test_streaming_capstone.py at sf0.001. This script prices the
claim that MOTIVATES it at scale: folding one new crawl epoch into an
existing curated corpus must cost ~O(epoch), not the batch rebuild's
O(corpus) — and the per-epoch fold wall must stay FLAT as history
accumulates (a fold whose wall grows with epoch index is re-mining
history x history, the exact failure the rev-keyed pair store exists to
prevent).

Protocol: the sf10-shape corpus (bench_sf10's replica cache; ~500k
pages) splits into N_EPOCHS round-robin epochs by doc_id. Each epoch
folds in sequence (wall recorded per fold), then the serve-side
read_curated_corpus wall, then batch c5 over the same cache as the
rebuild reference, then a hash-sum row-equality check between the two.

Usage: python tools/scale_incr_capstone.py [cache_dir] > SCALE_INCR.json
Requires the sf10 cache to exist (run tools/bench_sf10.py first).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

N_EPOCHS = 5


def _hash_sum(df):
    """Order-insensitive content fingerprint: sum of per-row xxhash64
    over every column cast to string (the stream-vs-batch equality
    check at a scale where exceptAll would shuffle 500k text rows
    twice)."""
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def main() -> None:
    from bench import wait_for_quiet_host
    from fhir_etl_spark.queries.capstone import _c5_page_col, c5_capstone_curation
    from fhir_etl_spark.session import get_spark, load_tables
    from fhir_etl_spark.streaming import capstone as sc

    cache = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_cache", "sf10",
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS_SF1")):
        raise SystemExit(f"scale cache missing at {cache} — run tools/bench_sf10.py")

    _, load_before = wait_for_quiet_host()
    spark = get_spark("scale_incr_capstone")
    spark.sparkContext.setLogLevel("ERROR")

    documents = load_tables(spark, cache, "documents")
    pages = documents.select("doc_id", _c5_page_col().alias("html"))
    n_pages = pages.count()

    state = tempfile.mkdtemp(prefix="incr_capstone_")
    epochs = []
    try:
        for e in range(N_EPOCHS):
            ep = pages.where(F.col("doc_id") % N_EPOCHS == e)
            t0 = time.monotonic()
            sc.fold_curation_epoch(spark, ep, state, e)
            epochs.append(
                {"epoch": e, "fold_sec": round(time.monotonic() - t0, 2)}
            )
            print(f"epoch {e}: {epochs[-1]['fold_sec']} s", file=sys.stderr)

        t0 = time.monotonic()
        inc = sc.read_curated_corpus(spark, state)
        inc_fp = _hash_sum(inc)
        serve_s = round(time.monotonic() - t0, 2)

        spark.catalog.clearCache()
        t0 = time.monotonic()
        batch_fp = _hash_sum(c5_capstone_curation(spark, cache))
        batch_s = round(time.monotonic() - t0, 2)
    finally:
        shutil.rmtree(state, ignore_errors=True)

    out = {
        "metric": "incremental_capstone_sf10_shape",
        "loadavg_before": load_before,
        "src": cache,
        "n_pages": n_pages,
        "n_epochs": N_EPOCHS,
        "epochs": epochs,
        "last_epoch_fold_sec": epochs[-1]["fold_sec"],
        "serve_read_sec": serve_s,
        "batch_c5_rebuild_sec": batch_s,
        "rows_equal": bool(
            inc_fp["n"] == batch_fp["n"] and inc_fp["h"] == batch_fp["h"]
        ),
        "incremental_rows": inc_fp["n"],
        "batch_rows": batch_fp["n"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
