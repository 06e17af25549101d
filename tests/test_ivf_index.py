"""Persisted IVF index contracts — the ANN twin of the bucketed LSH
dedup-index tests: build once, then every query batch must (a) read ONLY
its probed cells via static partition pruning and (b) return exactly the
in-session ann_ivf_topk answer (the codebook is deterministic, so the
round-trip through parquet must not move a single neighbor).
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators import similarity as ssim
from sdc_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def ivf_paths(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivfidx"))
    emb = read_table(spark, sf_dir, "embeddings")
    return ssim.write_ivf_index(spark, emb, name="ivftest", path_root=root), root


def test_search_prunes_cell_partitions(spark, sf_dir, ivf_paths):
    """The probed-cell set reaches the scan as a PartitionFilter: the
    cells scan lists only probe cells, never the full index."""
    (cent_p, cells_p), _ = ivf_paths
    q = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    out = ssim.ann_ivf_search_index(spark, cent_p, cells_p, q, k=5, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "cells" in ln
    ]
    assert scan_lines, plan
    assert any(
        "PartitionFilters: [cell" in ln and "IN" in ln for ln in scan_lines
    ), "\n".join(scan_lines)


def test_persisted_equals_insession(spark, sf_dir, ivf_paths):
    (cent_p, cells_p), _ = ivf_paths
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    persisted = {
        (r.qid, r.rank, r.nid)
        for r in ssim.ann_ivf_search_index(
            spark, cent_p, cells_p, q, k=5, nprobe=4
        ).collect()
    }
    insession = {
        (r.qid, r.rank, r.nid)
        for r in ssim.ann_ivf_topk(emb, q, k=5, n_cells=16, nprobe=4).collect()
    }
    assert persisted == insession and persisted


def test_index_layout_one_file_per_cell(spark, ivf_paths):
    """repartition-by-cell before the partitioned write: each cell
    directory holds exactly one data file (no small-files blowup)."""
    (_, cells_p), _ = ivf_paths
    cell_dirs = glob.glob(f"{cells_p}/cell=*")
    assert cell_dirs
    for d in cell_dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, (d, files)


def test_append_matches_insession_assignment(spark, sf_dir, tmp_path_factory):
    """append_ivf_index assigns the batch with the EXISTING codebook:
    after base-write + batch-append, the stored per-cell contents equal
    an in-session assignment of base ∪ batch under the reloaded
    codebook, and each cell directory grew by at most one file."""
    root = str(tmp_path_factory.mktemp("ivfappend"))
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    cent_p, cells_p = ssim.write_ivf_index(
        spark, base, name="ivfappend", path_root=root
    )
    ssim.append_ivf_index(spark, batch, cent_p, cells_p)

    stored = {
        (r.cell, r.nid) for r in spark.read.parquet(cells_p).select("cell", "nid").collect()
    }
    cent = spark.read.parquet(cent_p)
    v = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("nvec"),
        ssim.norm(F.col("embedding")).alias("nrm"),
    )
    expected = {
        (r.cell, r.nid)
        for r in ssim.ivf_assign(v, cent, "nid", "nvec").select("cell", "nid").collect()
    }
    assert stored == expected and stored

    for d in glob.glob(f"{cells_p}/cell=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 2, d


def test_compact_and_delete_maintenance(spark, sf_dir, tmp_path_factory):
    """LSM-ish maintenance: after an append, compaction returns to one
    file per cell with identical contents; deletion leaves searches
    unable to return the removed ids."""
    root = str(tmp_path_factory.mktemp("ivfmaint"))
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    cent_p, cells_p = ssim.write_ivf_index(
        spark, base, name="ivfmaint", path_root=root
    )
    ssim.append_ivf_index(spark, batch, cent_p, cells_p)

    before = {
        (r.cell, r.nid) for r in spark.read.parquet(cells_p).select("cell", "nid").collect()
    }
    ssim.compact_ivf_index(spark, "ivfmaint", path_root=root)
    after = {
        (r.cell, r.nid) for r in spark.read.parquet(cells_p).select("cell", "nid").collect()
    }
    assert after == before
    for d in glob.glob(f"{cells_p}/cell=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d

    doomed = batch.select("vec_id").filter(F.col("vec_id") < 100)
    doomed_ids = {r.vec_id for r in doomed.collect()}
    assert doomed_ids

    def _cell_files():
        return {
            (f, os.path.getsize(f))
            for d in glob.glob(f"{cells_p}/cell=*")
            for f in glob.glob(f"{d}/*.parquet")
        }

    before_files = _cell_files()
    ssim.delete_from_ivf_index(spark, doomed, "ivfmaint", path_root=root)
    # deferred default: O(|batch|) tombstone log, cell files byte-untouched
    assert _cell_files() == before_files
    assert ssim.ivf_tombstones(spark, cells_p) is not None
    q = emb.filter(F.col("vec_id") < 10)
    res = ssim.ann_ivf_search_index(spark, cent_p, cells_p, q, k=5, nprobe=16)
    assert not [r for r in res.collect() if r.nid in doomed_ids]
    # the tombstone anti-join must not break static cell pruning
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters: [cell" in ln and "IN" in ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "cells" in ln
    ), plan

    # compaction applies the log physically and clears it
    ssim.compact_ivf_index(spark, "ivfmaint", path_root=root)
    assert ssim.ivf_tombstones(spark, cells_p) is None
    stored_after = {
        r.nid for r in spark.read.parquet(cells_p).select("nid").collect()
    }
    assert stored_after == {c[1] for c in before} - doomed_ids
    res2 = ssim.ann_ivf_search_index(spark, cent_p, cells_p, q, k=5, nprobe=16)
    assert not [r for r in res2.collect() if r.nid in doomed_ids]
