"""Unit tests for the npbin Python DataSource (sources/np_source.py):
byte-exact round-trip, global positions across files, and file splitting
via chunk_elems."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sdc_spark.sources import np_source


def test_npbin_roundtrip_positions_and_split(spark, tmp_path):
    d = str(tmp_path / "npbin")
    os.makedirs(d)
    a = np.arange(0, 1000, dtype="float64") * 1.5
    b = np.arange(1000, 1750, dtype="float64") * 1.5
    a.tofile(os.path.join(d, "part-00000.bin"))
    b.tofile(os.path.join(d, "part-00001.bin"))

    np_source.register(spark)
    df = (
        spark.read.format("npbin")
        .option("path", d)
        .option("chunk_elems", 300)  # force intra-file splits
        .load()
    )
    # 1000/300 -> 4 parts, 750/300 -> 3 parts
    assert df.rdd.getNumPartitions() == 7
    pdf = df.toPandas().sort_values("pos").reset_index(drop=True)
    full = np.concatenate([a, b])
    assert len(pdf) == len(full)
    assert (pdf["pos"].to_numpy() == np.arange(len(full))).all()
    assert (pdf["value"].to_numpy() == full).all()  # byte-exact


def test_npbin_int32_dtype(spark, tmp_path):
    d = str(tmp_path / "npbin32")
    os.makedirs(d)
    np.arange(50, dtype="int32").tofile(os.path.join(d, "part-00000.bin"))
    np_source.register(spark)
    df = (
        spark.read.format("npbin")
        .option("path", d)
        .option("dtype", "int32")
        .load()
    )
    assert df.schema["value"].dataType.simpleString() == "int"
    assert df.agg({"value": "sum"}).collect()[0][0] == 49 * 50 // 2
