"""A first-class Spark source for raw NumPy binary files, on the Spark 4
Python DataSource API (`spark.dataSource.register`).

The reference reads flat binary arrays with ``np.fromfile`` and
MPI-chunked offsets (ref sdc/io/np_io.py:58-180). `read_numpy_binary`
(readers.py) covers the opaque-blob case via `binaryFile`; this module is
the typed, SPLITTABLE equivalent: a directory of ``part-*.bin`` raw
little-endian files (the layout `to_numpy_binary` writes) becomes a
DataFrame of ``(pos bigint, value <dtype>)`` where ``pos`` is the global
element index across files in filename order — exactly `np.fromfile`'s
flat-array semantics, distributed.

Scale design:
- planning is metadata-only (one `os.stat` per file on the driver);
- every file is split into ``chunk_elems``-element ranges, so one huge
  file still parallelizes — partition count tracks data size, not file
  count;
- `read` yields pyarrow RecordBatches built from `np.memmap` slices:
  zero-copy from the page cache into Arrow, no per-row Python.

Options: ``path`` (directory), ``dtype`` (numpy name, default float64),
``chunk_elems`` (default 4M elements per partition).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DTYPE_TO_SPARK = {
    "float64": "double",
    "float32": "float",
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "int8": "tinyint",
}


class _NpBinReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.dtype = options.get("dtype", "float64")
        self.chunk = int(options.get("chunk_elems", 4_000_000))

    def partitions(self):
        import numpy as np

        itemsize = np.dtype(self.dtype).itemsize
        parts = []
        base = 0  # global element index of the current file's first element
        for f in sorted(glob.glob(os.path.join(self.path, "part-*.bin"))):
            n = os.path.getsize(f) // itemsize
            for lo in range(0, n, self.chunk):
                hi = min(lo + self.chunk, n)
                parts.append(InputPartition((f, lo, hi, base + lo)))
            base += n
        return parts or [InputPartition((None, 0, 0, 0))]

    def read(self, part):
        import numpy as np
        import pyarrow as pa

        f, lo, hi, gbase = part.value
        if f is None or hi == lo:
            return
        mm = np.memmap(f, dtype=self.dtype, mode="r")
        batch = 1 << 20  # 1M elements per Arrow batch
        for s in range(lo, hi, batch):
            e = min(s + batch, hi)
            vals = np.asarray(mm[s:e])
            pos = np.arange(gbase + (s - lo), gbase + (e - lo), dtype="int64")
            yield pa.record_batch(
                [pa.array(pos), pa.array(vals)], names=["pos", "value"]
            )


class NpBinDataSource(DataSource):
    """``spark.read.format("npbin").option("path", d).load()``."""

    @classmethod
    def name(cls) -> str:
        return "npbin"

    def schema(self) -> str:
        spark_t = _DTYPE_TO_SPARK[self.options.get("dtype", "float64")]
        return f"pos bigint, value {spark_t}"

    def reader(self, schema):
        return _NpBinReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the npbin format on a session."""
    spark.dataSource.register(NpBinDataSource)
