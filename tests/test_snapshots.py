"""Snapshot versioning: atomic publish, time travel, rollback, diff."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.snapshots import (
    list_snapshots,
    publish_snapshot,
    read_snapshot,
    rollback,
    snapshot_diff,
)


def test_publish_time_travel_rollback(spark, tmp_path):
    root = str(tmp_path / "corpus")
    v1 = publish_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, txt string"), root, "first"
    )
    v2 = publish_snapshot(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, txt string"), root
    )
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, root).count() == 3  # latest = v2
    old = {(r.id, r.txt) for r in read_snapshot(spark, root, 1).collect()}
    assert old == {(1, "a"), (2, "b")}  # time travel unaffected by v2
    v3 = rollback(root, 1)
    assert v3 == 3
    assert {(r.id, r.txt) for r in read_snapshot(spark, root).collect()} == old
    # history is append-only: all three manifests remain, v3 reuses v1's dir
    ms = list_snapshots(root)
    assert [m["version"] for m in ms] == [1, 2, 3]
    assert ms[2]["dir"] == ms[0]["dir"]
    with pytest.raises(ValueError, match="no committed version 9"):
        rollback(root, 9)


def test_uncommitted_version_invisible(spark, tmp_path):
    """A crashed writer (data dir, no manifest) must not surface."""
    root = str(tmp_path / "corpus")
    publish_snapshot(spark.range(4), root)
    spark.range(99).write.parquet(os.path.join(root, "v=2"))  # no manifest
    assert [m["version"] for m in list_snapshots(root)] == [1]
    assert read_snapshot(spark, root).count() == 4
    # corrupted tempfile leftovers in _snapshots are ignored too
    open(os.path.join(root, "_snapshots", "junk.tmp"), "w").close()
    assert [m["version"] for m in list_snapshots(root)] == [1]


def test_snapshot_diff_classification(spark, tmp_path):
    root = str(tmp_path / "corpus")
    publish_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30)], "id long, txt string, n long"
        ),
        root,
    )
    publish_snapshot(
        spark.createDataFrame(
            [(2, "b", 20), (3, "c", 30), (4, "d", 40)], "id long, txt string, n long"
        ),
        root,
    )
    got = {
        r.id: r.change_type
        for r in snapshot_diff(spark, root, 1, 2, ["id"]).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
