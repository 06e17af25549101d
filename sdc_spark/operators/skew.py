"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in sdc_spark.session) handles most skew
at runtime, but it only splits SORT-MERGE join partitions. Explicit salting
is the portable fallback — e.g. a broadcast-infeasible dimension joined on
a power-law key (a "null-like" tenant id, a hot document source) — and the
standard interview answer made executable:

- fact side: append a random-but-deterministic salt in [0, salt) to the key
  (hash of a unique row id — NOT rand(), which breaks retry determinism);
- dim side: replicate each row salt times (explode a literal range);
- join on (key, salt) — the hot key's rows now spread over `salt`
  partitions instead of one straggler.

Replication multiplies the smaller side by `salt`, so pick salt ≈ the
skew factor you need to flatten, not more.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    fact_unique: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, salted `salt` ways.

    ``fact_unique``: columns whose hash spreads the fact side across salts
    (defaults to every fact column — any unique-ish subset works; the salt
    must be deterministic per row so retried tasks salt identically).

    ``how`` is restricted to inner/left (and their spellings): the dim side
    is replicated ``salt`` times, so right/full joins would emit each
    unmatched dim row once per replica."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r} "
            "(dim replicas would duplicate unmatched right rows)"
        )
    cols: Sequence[str] = fact_unique or fact.columns
    fsalt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt))
    f = fact.withColumn("__salt__", fsalt)
    d = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = f.join(d, [on, "__salt__"], how)
    return out.drop("__salt__")


def aqe_skew_join(
    fact: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Skew-mitigated join, AQE flavor: pin the sort-merge path (merge
    hint — OptimizeSkewedJoin only splits SMJ/SHJ partitions, never a
    broadcast join, which has no skew to split) and let the runtime
    split any post-shuffle partition exceeding
    ``skewedPartitionFactor`` x median and the byte threshold into
    advisory-sized slices, replicating the matching other-side rows.

    vs ``salted_join``: AQE needs no salt-count guess, splits only the
    partitions that are ACTUALLY oversized at runtime, and adds zero
    cost when the data turns out unskewed. Manual salting still wins
    when (a) the engine predates AQE / the plan must be deterministic
    (auditing, plan-pinned SLAs), (b) the skew is known and extreme so
    pre-spreading avoids even the first oversized-task attempt, or
    (c) the join must stay a broadcast-infeasible SHUFFLE on a key AQE
    won't split (e.g. skew inside a window/groupBy, not a join). See
    SCALING.md."""
    return fact.join(dim.hint("merge"), on, how)
