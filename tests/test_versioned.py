"""Snapshot-versioned tables: time travel, append/overwrite lineage,
atomic-commit invariants, vacuum."""

from __future__ import annotations

import os

import pytest

from fhir_etl_spark.sinks.versioned import (
    read_snapshot,
    snapshot_history,
    vacuum,
    write_snapshot,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"row{i}") for i in ids], "id long, s string")


def test_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, [1, 2]), t, mode="overwrite") == 0
    assert write_snapshot(_df(spark, [3]), t, mode="append") == 1
    assert write_snapshot(_df(spark, [9]), t, mode="overwrite") == 2

    def ids(version=None):
        return {r["id"] for r in read_snapshot(spark, t, version).collect()}

    assert ids(0) == {1, 2}
    assert ids(1) == {1, 2, 3}
    assert ids(2) == {9}
    assert ids() == {9}  # latest

    hist = snapshot_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["mode"] for h in hist] == ["overwrite", "append", "overwrite"]
    assert hist[1]["parent"] == 0 and hist[1]["n_data_dirs"] == 2


def test_old_files_never_rewritten(spark, tmp_path):
    """Append commits add directories; existing data files are immutable
    (mtime-stable), so pinned readers stay consistent."""
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, [1]), t)
    data_root = os.path.join(t, "data")
    before = {
        os.path.join(d, f): os.path.getmtime(os.path.join(data_root, d, f))
        for d in os.listdir(data_root)
        for f in os.listdir(os.path.join(data_root, d))
    }
    write_snapshot(_df(spark, [2]), t, mode="append")
    for rel, mtime in before.items():
        assert os.path.getmtime(os.path.join(data_root, rel)) == mtime


def test_vacuum_drops_unreferenced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, [1]), t, mode="overwrite")
    write_snapshot(_df(spark, [2]), t, mode="overwrite")  # v0's dir now unreferenced by v1
    # orphan from an "interrupted commit"
    orphan = os.path.join(t, "data", "v99-dead")
    os.makedirs(orphan)
    deleted = vacuum(t, keep_last=1)
    assert any("v0-" in d for d in deleted) and any("v99-dead" in d for d in deleted)
    assert {r["id"] for r in read_snapshot(spark, t).collect()} == {2}
    with pytest.raises(ValueError):
        read_snapshot(spark, t, version=0)  # manifest gone


def test_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        write_snapshot(_df(spark, [1]), str(tmp_path / "t"), mode="merge")
