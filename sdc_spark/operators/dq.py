"""Declarative data-quality expectations: a checks list compiled into ONE
aggregate pass over the table, producing a (check, n_violations, rate)
report — the pre-ingest gate a pipeline runs before accepting a drop.

Row-local predicates (nullness, ranges, set membership, regex) all ride
one map-side-combined aggregate: adding a check adds a column to the
aggregate, never a scan. Uniqueness checks add a count-distinct on the
key (same aggregate; Spark evaluates multiple distincts via expand — one
extra shuffle total). Cross-table referential checks belong to
fk_integrity_audit (anti-joins), not here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
    unique_cols: Sequence[str] = (),
) -> DataFrame:
    """``checks`` is [(name, ok_condition)]; a row violates a check when
    its condition is false or null. ``unique_cols`` adds a
    "unique:<col>" check counting duplicated values (count - distinct).
    Returns one row per check: (check, n_violations, violation_rate)."""
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for name, cond in checks:
        aggs.append(
            F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))).alias(f"v_{name}")
        )
    for c in unique_cols:
        aggs.append((F.count(c) - F.countDistinct(c)).alias(f"v_unique:{c}"))
    wide = df.agg(*aggs)
    names = [f"v_{name}" for name, _ in checks] + [
        f"v_unique:{c}" for c in unique_cols
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(n[2:]).alias("check"), F.col(f"`{n}`").alias("n_violations")
            )
            for n in names
        ]
    )
    return (
        wide.select(F.col("__n__"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.check").alias("check"),
            F.col("p.n_violations").alias("n_violations"),
            F.round(F.col("p.n_violations") / F.col("__n__"), 6).alias(
                "violation_rate"
            ),
        )
    )
