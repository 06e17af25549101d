"""Upsert / changelog-compaction operators — the lakehouse-style MERGE
surface a 100-TB pipeline needs around the relational core (no MERGE in
the reference, which is batch-functional; these are the Spark-first
equivalents of its overwrite-by-rebuild idiom).

Scale shapes:
- ``upsert``: target ⟕anti source on the keys + union. The anti join
  ships key columns only and broadcasts the source side when it is small
  (the common delta-batch case); the wide target rows never shuffle when
  the delta broadcasts.
- ``latest_by_key``: changelog compaction (CDC "latest state wins") as a
  single max_by hash aggregate — one map-side-combined shuffle of
  (key, version, payload), no window, no sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = True,
) -> DataFrame:
    """Rows from ``source`` replace same-key rows of ``target``; everything
    else is kept. Schemas must agree (column order reconciled)."""
    cols = target.columns
    src = source.select(*cols)
    anti_side = src.select(*keys)
    if broadcast_source:
        anti_side = F.broadcast(anti_side)
    kept = target.join(anti_side, list(keys), "left_anti")
    return kept.unionByName(src)


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Compact a changelog to its latest state: for each key keep the row
    with the maximal (version, tie_breaker) — deterministic under version
    ties when a tie_breaker (e.g. a unique id) is given."""
    order = (
        F.struct(F.col(version_col), F.col(tie_breaker))
        if tie_breaker
        else F.col(version_col)
    )
    payload = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.max_by(F.col(c), order).alias(c) for c in payload]
    )
