"""Bucketed co-located joins — the 100 TB join strategy made checkable at
test scale: both sides written bucketed+sorted on the join key join with
NO Exchange (and no sort) in the physical plan, because the bucketed scan
already satisfies the join's required distribution and ordering.

This is the storage-layout contract a production deployment relies on for
repeated fact↔fact joins (e.g. lineitem ⋈ orders on orderkey every run):
the shuffle is paid once at write time, then never again.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    names = ["bt_lineitem", "bt_orders"]
    for name, (tbl, key) in zip(names, [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            read_table(spark, sf_dir, tbl)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    li, ords = (spark.table(n) for n in bucketed_pair)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so the bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(ords, li.l_orderkey == ords.o_orderkey).select(
            "l_orderkey", "o_custkey", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # correctness: same row count as the plain (shuffling) join
        plain = (
            read_table(spark, "/root/testdata/sf0.001", "lineitem")
            .join(
                read_table(spark, "/root/testdata/sf0.001", "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the bucketing: partial=final
    hash aggregate with no Exchange."""
    li = spark.table(bucketed_pair[0])
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
