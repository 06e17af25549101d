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


def test_sweep_catches_a_deliberately_wrong_oracle(spark):
    """Gate-of-the-gate: register a canary query whose oracle has exactly
    the corpus_report_card bug class (Spark BIGINT sum vs DuckDB
    HUGEINT->float64 sum) and prove the sweep flags it — so a silent
    sweep regression can't quietly stop covering new registrations."""
    from pyspark.sql import functions as F

    from sdc_spark.plans.registry import ORACLES, QUERIES

    name = "__dtype_canary__"
    QUERIES[name] = lambda sp, sf: sp.range(3).agg(
        F.sum("id").cast("bigint").alias("total")
    )
    # DuckDB sum(BIGINT) -> HUGEINT -> pandas float64: the classic red
    ORACLES[name] = "SELECT sum(v) AS total FROM (VALUES (0), (1), (2)) t(v)"
    try:
        mismatches, _widths, errors = sweep(SF_DIR, only={name}, verbose=False)
        assert not errors, errors
        assert name in mismatches, (
            "dtype sweep failed to flag a deliberate int-vs-float oracle"
        )
        assert any("total" in m for m in mismatches[name]), mismatches[name]
    finally:
        del QUERIES[name]
        del ORACLES[name]
