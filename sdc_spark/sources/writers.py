"""Sinks (SURVEY.md §2.1).

The reference only ever had ``to_csv`` in its legacy distributed pass
(ref: sdc/distributed.py:938-975) and ``arr.tofile``; Spark's writers give
us csv/parquet/json/orc with partitioning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(bool(header)).lower()).csv(path)


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
