from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from sdc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (cluster smoke, scaling slopes, "
        "bench tripwires); skipped unless SPARK_GRAFT_SLOW_TESTS=1 so "
        "the default suite completes inside a CI/driver time budget",
    )


def pytest_collection_modifyitems(config, items):
    """Default-skip @pytest.mark.slow tests. The full suite grew past
    the driver's verification window (r11: the run was cut off at ~90%
    with zero failures — no completed test signal). The handful of
    multi-minute tests (separate-JVM cluster smoke, 16x scaling slopes,
    memory-capped subprocess probes) are environment/scaling evidence,
    not correctness gates; they run when SPARK_GRAFT_SLOW_TESTS=1 (done
    at least once per round, recorded in the round notes)."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow: set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("sdc_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
