"""Distributed as-of (backward nearest-key) join.

Reference: ``pd.merge_asof`` existed only in SDC's legacy MPI layer
(tests at /root/reference/sdc/tests/test_join.py:238-263, all skipped);
semantics follow pandas: for each left row, take the last right row whose
key is <= the left key (``allow_exact_matches=True``), optionally within
``by`` groups.

Spark has no native as-of join. The scalable formulation used here is the
union-and-carry-forward plan:

1. tag right rows 0 and left rows 1, union them on the key column;
2. sort by (by…, key, tag) — a range-partitioned shuffle sort, no
   all-pairs comparison, no broadcast requirement on either side;
3. ``last(right_value, ignorenulls=True)`` over the window
   ``partitionBy(by).orderBy(key, tag).rowsBetween(unboundedPreceding, 0)``
   carries the most recent right payload onto every left row;
4. keep tag==1 rows.

Cost: one shuffle of |L|+|R| rows keyed by (by, key) — the same order of
work as a sort-merge join, and AQE handles skewed ``by`` groups. This beats
a windowed range-join (which explodes) and stays fully JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """pandas.merge_asof equivalent; ``direction`` in {backward, forward}."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    by = list(by or [])

    lcols = left.columns
    rcols = [c for c in right.columns if c != on and c not in by]
    rpayload = {c: (f"{c}{suffix}" if c in lcols else c) for c in rcols}

    lu = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__key__"),
        F.lit(1).alias("__tag__"),
        *[F.col(c) for c in lcols if c != on and c not in by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in rpayload.items()],
    )
    ru = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__key__"),
        F.lit(0).alias("__tag__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on and c not in by],
        *[F.col(c).alias(a) for c, a in rpayload.items()],
    )
    unioned = lu.unionByName(ru)

    if direction == "backward":
        # right rows sort before left rows at equal keys → exact matches allowed
        w = (
            W.partitionBy(*by)
            .orderBy(F.col("__key__").asc(), F.col("__tag__").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        carried = [F.last(a, ignorenulls=True).over(w).alias(a) for a in rpayload.values()]
    else:
        w = (
            W.partitionBy(*by)
            .orderBy(F.col("__key__").desc(), F.col("__tag__").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        carried = [F.last(a, ignorenulls=True).over(w).alias(a) for a in rpayload.values()]

    out = unioned.select(
        *by,
        F.col("__key__").alias(on),
        "__tag__",
        *[c for c in lcols if c != on and c not in by],
        *carried,
    )
    return out.filter(F.col("__tag__") == 1).drop("__tag__")
