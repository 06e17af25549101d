"""WebDataset tar sharding: round-trip, determinism, atomic publish."""

from __future__ import annotations

import os
import sys
import tarfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.sources.webdataset import read_webdataset, write_webdataset


def _sample(spark, n=40):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("payload"),
    )


def test_webdataset_roundtrip(spark, tmp_path):
    path = str(tmp_path / "wds")
    summary = write_webdataset(
        _sample(spark), path, "id", {"txt": "text", "bin": "payload"}, num_shards=4
    ).collect()
    assert sum(r.n_samples for r in summary) == 40
    assert sum(r.n_members for r in summary) == 80
    assert sorted(r.shard for r in summary) == [f"shard-{i:06d}.tar" for i in range(4)]
    back = read_webdataset(spark, path)
    assert back.count() == 80
    txt = {
        r.key: bytes(r.content).decode()
        for r in back.filter(F.col("ext") == "txt").collect()
    }
    assert txt["7"] == "doc 7" and len(txt) == 40
    # wide reconstruction via pivot
    wide = (
        back.groupBy("key").pivot("ext", ["txt", "bin"]).agg(F.first("content"))
    )
    r = wide.filter(F.col("key") == "3").collect()[0]
    assert bytes(r.txt) == b"doc 3" and bytes(r.bin) == b"payload-3"


def test_webdataset_deterministic_bytes(spark, tmp_path):
    """Same input -> bit-identical shards (hash partitioning, sorted
    member order, zeroed mtimes): re-writing must reproduce every tar."""
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (p1, p2):
        write_webdataset(
            _sample(spark), p, "id", {"txt": "text"}, num_shards=3
        ).collect()
    for i in range(3):
        f = f"shard-{i:06d}.tar"
        with open(os.path.join(p1, f), "rb") as a, open(os.path.join(p2, f), "rb") as b:
            assert a.read() == b.read(), f
    # no in-progress temp files left behind
    assert not [x for x in os.listdir(p1) if x.endswith(".inprogress")]


def test_webdataset_member_layout(spark, tmp_path):
    """Members follow the <key>.<ext> convention, sorted by key within a
    shard, and null members are skipped."""
    path = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [("a", "one", b"1"), ("b", None, b"2"), ("c", "three", None)],
        "k string, text string, payload binary",
    )
    write_webdataset(
        df, path, "k", {"txt": "text", "bin": "payload"}, num_shards=1
    ).collect()
    with tarfile.open(os.path.join(path, "shard-000000.tar")) as tar:
        names = [m.name for m in tar.getmembers()]
    assert names == ["a.bin", "a.txt", "b.bin", "c.txt"]
