"""Determinism under task retries: run the distributed scan machinery with
injected task failures (each task's first attempt dies) on a
retry-enabled master and verify results are bit-identical to the clean
run. At 100 TB task retries are routine — a scan whose output depends on
attempt scheduling corrupts silently; this probe makes that class of bug
a red exit code.

Runs in its own process because the retry policy is fixed at master
construction (`local[N, maxFailures]`).

Usage: python tools/retry_probe.py   (exit 0 = deterministic under retry)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    spark = (
        SparkSession.builder.appName("retry_probe")
        .master("local[8, 3]")  # allow 2 retries per task
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sdc_spark.operators import order as sorder

    n = 20_000
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )

    def flaky(batches):
        ctx = TaskContext.get()
        first = True
        for pdf in batches:
            if first and ctx is not None and ctx.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            first = False
            yield pdf

    flaky_base = base.mapInPandas(flaky, "k long, v double")

    clean = sorder.scan_sum_intkey(base, "k", F.col("v"), "cum")
    dirty = sorder.scan_sum_intkey(flaky_base, "k", F.col("v"), "cum")

    a = clean.orderBy("k").toPandas()
    b = dirty.orderBy("k").toPandas()
    pd.testing.assert_frame_equal(a, b)

    # truth: plain pandas cumsum
    exp = a.sort_values("k").reset_index(drop=True)
    want = exp["v"].cumsum()
    assert (exp["cum"] == want).all(), "scan result != pandas cumsum"

    # also exercise the generic sampled-range scan under retry
    clean2 = sorder.scan_sum(base, ["k"], F.col("v"), "cum").orderBy("k").toPandas()
    dirty2 = (
        sorder.scan_sum(flaky_base, ["k"], F.col("v"), "cum").orderBy("k").toPandas()
    )
    pd.testing.assert_frame_equal(clean2, dirty2)

    print("retry probe OK: scans bit-identical under injected task retries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
