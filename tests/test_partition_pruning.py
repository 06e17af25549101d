"""Partitioned-write → partition-pruned read: the other half of the
storage-layout story next to bucketing (tests/test_bucketing.py). A filter
on the partition column must prune at the FILE level (PartitionFilters),
not scan-and-discard — at 100 TB the difference is reading one directory
vs the whole lake.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.sources.readers import read_table
from sdc_spark.sources.writers import to_parquet


@pytest.fixture(scope="module")
def parted_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_parted"))
    to_parquet(
        read_table(spark, sf_dir, "events"), out, partition_by=["event_type"]
    )
    return out


def test_partition_pruning(spark, sf_dir, parted_dir):
    df = spark.read.parquet(parted_dir).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must appear in PartitionFilters, not be a
    # post-scan Filter over all partitions
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, f"partition filter not pushed: {pf!r}"

    exp = (
        read_table(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
    )
    assert df.count() == exp > 0


def test_partition_values_roundtrip(spark, sf_dir, parted_dir):
    """Partitioned write must preserve every group's row count."""
    got = {
        r.event_type: r.n
        for r in spark.read.parquet(parted_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {
        r.event_type: r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_salted_join_equals_plain(spark, sf_dir):
    """Salted join must produce exactly the plain join's result (same rows,
    same multiplicity) — salting only changes the partition layout."""
    from sdc_spark.operators.skew import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = salted_join(li, part, on="l_partkey", salt=8)
    plain = li.join(part, "l_partkey")
    assert salted.count() == plain.count() > 0
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_write_dataset_layout_and_pruning(spark, sf_dir, tmp_path_factory):
    """write_dataset: hive partition dirs, in-file sort, bounded file
    sizes, and partition pruning on read."""
    import os

    from pyspark.sql import functions as F

    from sdc_spark.sources.readers import read_table
    from sdc_spark.sources.writers import write_dataset

    out = str(tmp_path_factory.mktemp("curated"))
    docs = read_table(spark, sf_dir, "documents")
    write_dataset(
        docs,
        out,
        partition_by=["source"],
        sort_by=["n_chars"],
        max_records_per_file=40,
    )
    subdirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    n_sources = docs.select("source").distinct().count()
    assert len(subdirs) == n_sources
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # every file respects the record cap and is internally sorted
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert max(r.n for r in per_file) <= 40
    one = spark.read.parquet(out + "/" + subdirs[0]).toPandas()
    # in-file ordering: within each physical file n_chars is non-decreasing
    fdf = (
        back.filter(F.col("source") == subdirs[0].split("=")[1])
        .withColumn("f", F.input_file_name())
        .select("f", "n_chars")
        .toPandas()
    )
    for _, g in fdf.groupby("f"):
        vals = g["n_chars"].tolist()
        assert vals == sorted(vals)
    assert len(one) > 0
    # pruning: a source predicate reaches the scan as a PartitionFilter
    plan = (
        back.filter(F.col("source") == "src0")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(source" in plan
