"""Small-file compaction: FS-metadata sizing, file-count reduction, row
preservation, and optional clustered rewrite."""

from __future__ import annotations

import glob

from fhir_etl_spark.operators.maintenance import compact, plan_compaction
from fhir_etl_spark.session import load_tables


def _parquet_files(path: str) -> list[str]:
    return [
        f for f in glob.glob(f"{path}/*.parquet") if not f.startswith(("_", "."))
    ]


def test_compaction_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    docs = load_tables(spark, sf_dir, "documents")
    docs.repartition(64).write.parquet(src)  # streaming-shaped fragmentation
    assert len(_parquet_files(src)) == 64

    before = plan_compaction(spark, src, target_bytes=1 * 1024 * 1024)
    assert before.n_files == 64 and before.total_bytes > 0

    executed = compact(spark, src, dest, target_bytes=1 * 1024 * 1024)
    got_files = _parquet_files(dest)
    assert len(got_files) == executed.target_partitions < 64
    assert spark.read.parquet(dest).count() == docs.count()


def test_compaction_with_sort_restores_clustering(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    src = str(tmp_path / "frag2")
    dest = str(tmp_path / "sorted")
    docs = load_tables(spark, sf_dir, "documents")
    docs.repartition(32).write.parquet(src)

    compact(spark, src, dest, target_bytes=256 * 1024, sort_cols=["doc_id"])
    files = _parquet_files(dest)
    if len(files) < 2:  # tiny SF can legitimately compact to one file
        return
    # clustered rewrite → per-file doc_id ranges are disjoint-ish: total
    # span across files ≈ domain, not n_files × domain
    spans, lo_all, hi_all = [], None, None
    for f in files:
        st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
        spans.append((st.min, st.max))
        lo_all = st.min if lo_all is None else min(lo_all, st.min)
        hi_all = st.max if hi_all is None else max(hi_all, st.max)
    total_span = sum(hi - lo for lo, hi in spans)
    assert total_span < 1.5 * (hi_all - lo_all)
