"""MultiIndex constructors (ref /root/reference/sdc/extensions/indexes/
multi_index_ext.py — a 972-LoC Numba extension; here a MultiIndex is the
engine-wide convention "multiple key columns", so the constructors just
build the key frame).

``from_product`` / ``from_tuples`` return a Spark DataFrame with one
column per level — usable directly as the right side of a reindex join
or a groupBy key axis. Inputs are driver-side lists (pandas signature);
products are built by cross-joining per-level literal frames so a large
product never materializes on the driver."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _names(n: int, names: Sequence[str] | None) -> list[str]:
    if names is not None:
        if len(names) != n:
            raise ValueError(f"need {n} names, got {len(names)}")
        return list(names)
    return [f"level_{i}" for i in range(n)]


def from_product(
    spark: SparkSession,
    iterables: Sequence[Sequence],
    names: Sequence[str] | None = None,
) -> DataFrame:
    """Cartesian product of the level iterables (pandas
    MultiIndex.from_product). Each level ships to the cluster as its own
    tiny frame; the product is |l1|·|l2|·… rows but is assembled
    distributed (cross joins of broadcast-size inputs), not driver-side."""
    cols = _names(len(iterables), names)
    out: DataFrame | None = None
    for level, name in zip(iterables, cols):
        from sdc_spark.sources.readers import local_rows

        lf = local_rows(spark, [(v,) for v in level], f"`{name}` {_ddl(level)}")
        out = lf if out is None else out.crossJoin(lf)
    if out is None:
        raise ValueError("need at least one level")
    return out


def from_tuples(
    spark: SparkSession,
    tuples: Sequence[tuple],
    names: Sequence[str] | None = None,
) -> DataFrame:
    """Explicit key tuples (pandas MultiIndex.from_tuples)."""
    if not tuples:
        raise ValueError("need at least one tuple")
    n = len(tuples[0])
    cols = _names(n, names)
    ddl = ", ".join(
        f"`{c}` {_ddl([t[i] for t in tuples])}" for i, c in enumerate(cols)
    )
    from sdc_spark.sources.readers import local_rows

    return local_rows(spark, [tuple(t) for t in tuples], ddl)


def _ddl(values: Sequence) -> str:
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        return "string"
    return "string"


def range_index(
    spark: SparkSession, start: int, stop: int | None = None, step: int = 1
) -> DataFrame:
    """RangeIndex constructor (ref sdc/extensions/indexes/range_index_ext.py
    — start/stop/step triple): a distributed long range as an __index__
    frame, joinable as a reindex axis."""
    if stop is None:
        start, stop = 0, start
    return spark.range(start, stop, step).select(F.col("id").alias("__index__"))
