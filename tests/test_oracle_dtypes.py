"""Dtype-equality gate: Spark result vs DuckDB oracle, every oracled query.

The driver's correctness gate hashes TYPED values, so a Spark bigint
column whose oracle twin comes back float64 (DuckDB integer SUM ->
HUGEINT -> pandas float64) is a hash mismatch even when every value is
numerically identical — the round-6 `webdataset_export_roundtrip` red
row, with 23 latent siblings. tools/check_correctness.py canonicalizes
integral floats and therefore CANNOT see this class; this test can.

Rule: the dtype *kind* (int vs float vs bool vs datetime vs object) must
match for every shared column. Width differences (int32 vs int64) hash
identically via str() and are allowed — the driver has graded such
columns green for multiple rounds (e.g. `window_rank_family.rnk`).

Runs the full registry at sf0.001 (~2-3 min); this is the price of the
gate actually covering every oracle rather than a sample.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from dtype_sweep import sweep  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_every_oracle_matches_spark_dtype_kind(spark):
    mismatches, _widths, errors = sweep(SF_DIR, verbose=False)
    assert not errors, f"queries errored during sweep: {errors}"
    assert not mismatches, (
        "oracle dtype-kind mismatches (driver-visible hash reds): "
        + "; ".join(f"{n}: {v}" for n, v in sorted(mismatches.items()))
    )
