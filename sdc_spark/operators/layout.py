"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping — the lakehouse ``OPTIMIZE ZORDER BY``
primitive, expressed with Spark built-ins only.

Parquet readers prune row groups / files by min-max statistics. A table
sorted by one key prunes on that key only; interleaving the bits of
several normalized keys (the Z-curve) gives every participating column
locality, so point/range predicates on ANY of them skip most files.

Everything is a row-local integer expression (whole-stage codegen):
- each column is rank-normalized to [0, 2^bits) via exact percentiles
  (one tiny aggregate per column, broadcast back as literal bounds);
- the Morton code interleaves the bit positions with shifts/ors;
- the write is repartitionByRange + sortWithinPartitions on the z-value,
  so each output file covers a compact Z-curve segment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) by min-max
    position (monotonic, ties fine — Z-order needs locality, not exact
    ranks)."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(F.lit(0.0))
    scaled = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "__z__"
) -> DataFrame:
    """Attach the Morton code of ``cols`` (each min-max normalized to
    ``bits`` bits). One aggregate for the bounds (broadcast as a 1-row
    cross join); the interleave is a pure bitwise expression."""
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}__") for c in cols],
        *[F.max(c).alias(f"__hi_{c}__") for c in cols],
    )
    b = df.crossJoin(F.broadcast(bounds))
    norms = [
        _normalize(F.col(c), F.col(f"__lo_{c}__"), F.col(f"__hi_{c}__"), bits)
        for c in cols
    ]
    z: Column = F.lit(0).cast("long")
    d = len(cols)
    for bit in range(bits):
        for i, n in enumerate(norms):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(n, bit).bitwiseAND(F.lit(1)), bit * d + i
                )
            )
    drop = [f"__lo_{c}__" for c in cols] + [f"__hi_{c}__" for c in cols]
    return b.withColumn(out, z).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``:
    range-partition by z-value (one shuffle — the pay-once layout cost),
    sort within partitions, drop the helper column. Each output file then
    covers a tight hyper-rectangle of the participating columns, so
    min-max pruning works for predicates on any of them."""
    zdf = zvalue(df, cols, bits)
    part = (
        zdf.repartitionByRange(n_files, "__z__")
        if n_files
        else zdf.repartitionByRange("__z__")
    )
    part.sortWithinPartitions("__z__").drop("__z__").write.mode(mode).parquet(path)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction (the lakehouse ``OPTIMIZE`` / bin-packing
    primitive): rewrite a parquet directory into ceil(total_bytes /
    target) files. Small files are the classic 100-TB killer — a table
    written by 10k streaming micro-batches reads 10k footers and
    schedules 10k splits; compaction restores scan efficiency.

    Sizing comes from the file-system listing (no data pass); the rewrite
    is one shuffle-free coalesce when shrinking file count, or a
    range-partitioned sort when ``sort_col`` is given (restoring
    clustering while compacting). Returns the output file count."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_col is not None:
        out = df.repartitionByRange(n_files, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return sum(
        1
        for _, _, files in os.walk(dst_dir)
        for f in files
        if f.endswith(".parquet")
    )
