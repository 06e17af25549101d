"""WebDataset-style tar sharding: the de-facto interchange format for
multimodal training data (public WebDataset convention — samples are
groups of tar members sharing a basename: ``<key>.txt``, ``<key>.jpg``,
``<key>.cls`` …, packed into fixed-size ``shard-NNNNNN.tar`` files that
training loaders stream sequentially).

Write path: hash-repartition by sample key to the target shard count,
sort within each partition (deterministic member order), then ONE
Arrow-batched ``mapInPandas`` stage per partition opens
``shard-<partition>.tar``, streams every batch into it, and emits a
single summary row. No driver collect, no shuffle beyond the one
repartition — each executor writes its own shard, which is exactly how
a 1000-executor job materializes a 100-TB corpus as ~100k shards.

Read path: ``binaryFile`` over ``*.tar`` (splittable at file granularity
— shard size IS the parallelism unit, per the WebDataset design), then a
``mapInPandas`` untar into long-format rows (key, ext, content). String
vs binary typing is the caller's concern — members are opaque bytes.

Reference parity: the reference's io surface is flat CSV/numpy files
(`sdc/io/csv_ext.py`, `sdc/io/np_io.py`); this is the missing
training-loader sink for the multimodal columns in SURVEY §2's
extension surface.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WRITE_SUMMARY_SCHEMA = "shard string, n_samples long, n_members long, n_bytes long"
READ_SCHEMA = "key string, ext string, content binary"


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    member_cols: dict[str, str],
    num_shards: int = 8,
) -> DataFrame:
    """Pack ``df`` into WebDataset tar shards under ``path``.

    ``member_cols`` maps extension -> column (e.g. ``{"txt": "text",
    "bin": "payload"}``); string columns are utf-8-encoded, binary pass
    through. Returns the (lazy) per-shard summary DataFrame — executing
    it performs the write. Sample->shard assignment is hash(key) mod
    num_shards (deterministic), member order within a shard is sorted by
    key.

    ``path`` must be on a filesystem shared by driver and executors
    (local dir in local mode, NFS/Lustre/FUSE-mounted object store on a
    cluster) — the driver creates the directory, executors write into
    it. Each task ATTEMPT writes its own ``.{shard}.attempt-{id}.inprogress``
    temp file before the atomic rename, so a speculative or retried
    attempt can never interleave bytes with the original; whichever
    attempt renames last wins with a complete, self-consistent tar."""
    os.makedirs(path, exist_ok=True)
    exts = sorted(member_cols)
    sel = df.select(
        F.col(key_col).cast("string").alias("__key__"),
        *[F.col(c).alias(e) for e, c in sorted(member_cols.items())],
    )
    part = sel.repartition(num_shards, "__key__").sortWithinPartitions("__key__")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        shard = f"shard-{pid:06d}.tar"
        # attempt-unique temp name: concurrent speculative/retried
        # attempts each write their own file; os.replace publishes
        # whichever finishes last as one complete tar (never interleaved)
        tmp = os.path.join(
            path, f".{shard}.attempt-{ctx.taskAttemptId()}.inprogress"
        )
        n_samples = n_members = 0
        tar = None
        try:
            for pdf in batches:
                if tar is None:
                    tar = tarfile.open(tmp, "w")
                for _, row in pdf.iterrows():
                    key = row["__key__"]
                    n_samples += 1
                    for ext in exts:
                        val = row[ext]
                        if val is None:
                            continue
                        data = val.encode("utf-8") if isinstance(val, str) else bytes(val)
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # deterministic archives
                        tar.addfile(info, io.BytesIO(data))
                        n_members += 1
            if tar is not None:
                tar.close()
                tar = None
                os.replace(tmp, os.path.join(path, shard))  # atomic publish
                yield pd.DataFrame(
                    {
                        "shard": [shard],
                        "n_samples": [n_samples],
                        "n_members": [n_members],
                        "n_bytes": [os.path.getsize(os.path.join(path, shard))],
                    }
                )
        finally:
            if tar is not None:  # batch iteration failed mid-shard
                tar.close()
                os.remove(tmp)

    return part.mapInPandas(pack, WRITE_SUMMARY_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read tar shards back as long-format rows (key, ext, content) —
    one input split per shard (binaryFile), untar inside the Arrow
    batch. Pivot by ext downstream to reconstruct wide samples."""
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.tar"))

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, exts_, bufs = [], [], []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        stem, _, ext = m.name.rpartition(".")
                        keys.append(stem)
                        exts_.append(ext)
                        bufs.append(tar.extractfile(m).read())
            yield pd.DataFrame({"key": keys, "ext": exts_, "content": bufs})

    return files.select("content").mapInPandas(unpack, READ_SCHEMA)
