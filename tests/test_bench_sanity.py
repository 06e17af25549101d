"""Catastrophic-regression guard on the headline bench queries.

The driver's bench runs once per round; a plan regression landed between
rounds (a lost broadcast hint, an accidental cartesian product, a
materialize that stopped truncating lineage) would only surface there.
This test runs five headline queries once at sf0.01 and asserts
wall-time under DELIBERATELY LOOSE pinned ceilings — ~8-15x the
measured warm times on this host (q1 0.7s, minhash 2.6s, asof 1.2s,
window 0.3s, broadcast-join 0.5s), so host contention and CI noise
never trip it, but an order-of-magnitude plan regression fails the
suite instead of waiting for the driver's bench.
"""

from __future__ import annotations

import time

import pytest

import sdc_spark.plans.all  # noqa: F401  (populate registry)
from sdc_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.01"

# (query, ceiling_seconds) — ceilings are ~8-15x warm measurements,
# documented loose on purpose: this is a tripwire, not a benchmark.
CEILINGS = [
    ("q1_pricing_summary", 8.0),
    ("dedup_minhash_lsh", 25.0),
    ("merge_asof_backward", 12.0),
    ("window_topk_per_group", 5.0),
    ("join_inner_broadcast", 6.0),
]


@pytest.mark.parametrize("name,ceiling", CEILINGS)
def test_headline_query_under_ceiling(spark, name, ceiling):
    fn = QUERIES[name]
    # warm once: JVM/codegen/scan caches; the ceiling applies to the
    # steady-state run the bench also measures
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    assert elapsed < ceiling, (
        f"{name} took {elapsed:.1f}s at sf0.01 (ceiling {ceiling}s, "
        f"warm measurement ~{ceiling / 10:.1f}s) — likely a plan "
        "regression (lost broadcast, cartesian product, lineage blowup)"
    )
