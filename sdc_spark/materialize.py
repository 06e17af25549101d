"""Cluster-durable materialization primitive.

Several operators (scan machinery, as-of join, dedup banding, IVF
assignment, iterative connected components) REQUIRE their intermediate to
be computed exactly once: two plan branches re-executing a
``repartitionByRange`` would re-sample range boundaries per branch and the
P-row fix-up joins misalign; iterative algorithms need lineage truncation
so round N's plan is O(1), not O(N).

``materialize(df)`` is the one primitive they all use. The strategy is a
session config so the SAME plan code runs in local mode and on a fleet:

``spark.sdc.materialize.mode``:

- ``localCheckpoint`` (default) — eager local checkpoint. Fastest; blocks
  live unreplicated on executor block managers and lineage is truncated,
  so an executor loss fails the query (it must be restarted). Right for
  local[N] (one JVM — no executor loss) and for short interactive cluster
  jobs where restart-on-loss is acceptable.
- ``persist`` — persist(MEMORY_AND_DISK) + count(). Blocks spill to local
  disk under memory pressure (a 100-TB intermediate won't OOM the cache),
  and lost partitions are RECOMPUTED from lineage on executor failure —
  the durable default for long-running cluster jobs. Lineage is kept, so
  for unbounded iterative loops prefer ``checkpoint``.
- ``checkpoint`` — reliable checkpoint to ``spark.sdc.checkpoint.dir``
  (HDFS/S3). Survives any executor loss AND truncates lineage; the right
  mode for 100+-round iterative jobs on preemptible fleets. Requires the
  dir to be set (falls back to sparkContext.setCheckpointDir value).

All three are EAGER: when ``materialize`` returns, the data is computed
and every downstream branch reads the same bytes. Correctness is
mode-independent (pinned by tests/test_materialize.py which re-runs a
boundary-sensitive scan query under each mode and compares bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MODE_KEY = "spark.sdc.materialize.mode"
DIR_KEY = "spark.sdc.checkpoint.dir"
_VALID = ("localCheckpoint", "persist", "checkpoint")


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute ``df`` once and return a frame whose every consumer
    reads that single computation (see module docstring for the mode
    semantics). Drop-in replacement for ``df.localCheckpoint(eager=True)``.
    """
    spark = df.sparkSession
    mode = spark.conf.get(MODE_KEY, "localCheckpoint")
    if mode not in _VALID:
        raise ValueError(f"{MODE_KEY}={mode!r}; expected one of {_VALID}")
    if mode == "localCheckpoint":
        return df.localCheckpoint(eager=True)
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager: all branches must see one computation
        return out
    # mode == "checkpoint"
    sc = spark.sparkContext
    ckdir = spark.conf.get(DIR_KEY, None)
    if ckdir is not None and sc.getCheckpointDir() != ckdir:
        sc.setCheckpointDir(ckdir)
    if sc.getCheckpointDir() is None:
        raise ValueError(
            f"materialize mode 'checkpoint' needs {DIR_KEY} or "
            "sparkContext.setCheckpointDir()"
        )
    return df.checkpoint(eager=True)


def unmaterialize(df: DataFrame) -> None:
    """Release cached blocks for a frame produced by ``materialize`` in
    ``persist`` mode (no-op for the checkpoint modes, whose blocks are
    owned by the context / checkpoint dir)."""
    try:
        df.unpersist()
    except Exception:
        pass
