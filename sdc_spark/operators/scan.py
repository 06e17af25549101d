"""Scan-layer parallelism helpers shared by the operator modules.

One concern lives here: heavy per-row compute (shingling, hashing,
tokenization, Arrow-batched Python decode) placed directly above a scan
inherits the SCAN's parallelism — and a small/unsplittable input (one
file, one parquet row group) resolves to one task, serializing the whole
pass on one core (optimization guide §2.5, "input skew: one huge
unsplittable file … repartition immediately after the read").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Scale-adaptive parallelism floor for heavy per-row compute above a
    low-parallelism scan.

    The shingle/hash/tokenize/decode operators that call this do orders
    of magnitude more per-row work than the scan itself; when the input
    resolves to fewer scan partitions than the session has cores (small
    files, one unsplittable file, a single row group), the whole pass
    runs on one core while the rest idle — measured on this repo's
    bench: the 1-task shingle+MinHash stage of the LSH index write was
    3.8s warm (159s on a cold JVM, where one core pays the whole
    interpreter penalty of the generated aggregate code).

    Deterministic by construction: a hash repartition on ``key_cols``
    (the per-document id), never round-robin — task retries reproduce the
    same row→partition mapping, and every consumer below is keyed on the
    same id, so results are partitioning-independent. Self-disabling at
    scale: when the scan already has at least half as many partitions as
    cores (any real corpus), the input is returned untouched — so a
    100-TB run never pays a full-text shuffle for this."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001  (Connect or exotic plans: keep as-is)
        return df
    if 2 * n >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])


def spread_scan_py(df: DataFrame, *key_cols: str) -> DataFrame:
    """``spread_scan`` variant for Arrow/pandas Python-boundary stages
    (mapInPandas decode/featurize chains).

    Python stages pay a per-task cost JVM expressions do not: a worker
    lease + Arrow serialization round-trip per eval node per task, and
    the pipelines this helper serves chain TWO Python eval nodes in one
    stage (synthesize → decode), so spreading to the full core count
    runs 2x cores Python workers on cores slots. Measured on this
    repo's bench (multimodal family, sf0.1): full-core spread is
    uniformly SLOWER (0.9s → 2.9s on the BMP decode), while half-core
    spread wins exactly where per-partition Python compute dominates
    the worker overhead (resize 3.2s → 1.7s, PNG decode 2.7s → 1.8s)
    and loses where it does not. Hence: target = half the session
    parallelism (one chained worker pair per two cores), applied only
    by the operators where the win is measured; same determinism and
    self-disabling-at-scale contract as ``spread_scan``."""
    spark = df.sparkSession
    target = max(2, spark.sparkContext.defaultParallelism // 2)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001  (Connect or exotic plans: keep as-is)
        return df
    if 2 * n >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])
