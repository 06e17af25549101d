"""Smoke tests: driver contract + registry integrity + flagship plan shape."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from sdc_spark.plans.registry import ORACLES, QUERIES


def test_registry_nonempty():
    assert len(QUERIES) >= 10


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_queries_execute(spark, sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            n = fn(spark, sf_dir).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, failures


def test_q1_plan_pushes_filter(spark, sf_dir):
    """The shipdate filter must reach the parquet scan (PushedFilters)."""
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


def test_examples_run(spark):
    """The examples/ scripts must stay runnable (user-facing switch path
    from the reference's examples/)."""
    import subprocess
    import sys as _sys

    for script in (
        "examples/basic_workflow.py",
        "examples/series_rolling.py",
        "examples/llm_curation_pipeline.py",
    ):
        r = subprocess.run(
            [_sys.executable, f"/root/repo/{script}"],
            capture_output=True, text=True, timeout=240,
        )
        assert r.returncode == 0, f"{script}:\n{r.stderr[-800:]}"


def test_scan_determinism_under_task_retries():
    """Injected first-attempt task failures must not change scan results
    (tools/retry_probe.py — own process because maxFailures is fixed at
    master construction)."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "/root/repo/tools/retry_probe.py"],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
