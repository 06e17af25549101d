"""Dataset snapshot versioning: atomic publish, time travel, rollback,
and version diff over plain parquet directories — the reproducibility
primitive a training-data pipeline needs ("train run X used corpus
v12") without requiring a table-format dependency.

Layout under a snapshot root:
    <root>/v=<N>/...parquet          immutable data directories
    <root>/_snapshots/<N>.json       one manifest file per committed version

Commit protocol (why readers never see partial data): parquet lands in
its ``v=<N>`` directory FIRST; the version becomes visible only when the
single-file manifest is moved into ``_snapshots/`` with ``os.rename`` —
atomic on POSIX, and a single-object PUT on an object store. A crashed
writer leaves an orphaned data dir but never a readable half-version.
Rollback publishes a NEW manifest pointing at an OLD data dir —
metadata-only, no data copy, and the forward history is preserved
(audit trail), exactly the Iceberg/Delta behavior re-expressed on
bare parquet.

Reference parity: the reference has no versioned storage (its io layer
is flat files, `sdc/io/csv_ext.py`, `sdc/io/np_io.py`); this extends the
curated-export layer (operators/layout.py) the way a production corpus
store must.

Scale: manifests are O(1) driver-side JSON; data stays columnar parquet
(predicate pushdown / partition pruning intact through ``read_snapshot``);
``snapshot_diff`` is one co-partitioned full-outer join on the key — the
only shuffle, sized by the table not the history.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_snapshots"


def list_snapshots(root: str) -> list[dict]:
    """All committed versions, ascending. Uncommitted (orphaned) data
    dirs are invisible — only a manifest makes a version exist."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                out.append(json.load(fh))
    return sorted(out, key=lambda m: m["version"])


def publish_snapshot(df: DataFrame, root: str, note: str = "") -> int:
    """Write ``df`` as the next version and commit it atomically.

    Data first (``v=<N>`` dir), manifest last (tempfile + ``os.rename``
    into ``_snapshots/``): the rename is the commit point. Returns the
    new version number."""
    manifests = list_snapshots(root)
    version = (manifests[-1]["version"] + 1) if manifests else 1
    data_dir = os.path.join(root, f"v={version}")
    df.write.mode("errorifexists").parquet(data_dir)
    _commit(root, {"version": version, "dir": f"v={version}", "note": note})
    return version


def rollback(root: str, to_version: int) -> int:
    """Metadata-only rollback: commit a new version whose data dir is the
    old version's (no copy). History stays append-only."""
    by_v = {m["version"]: m for m in list_snapshots(root)}
    if to_version not in by_v:
        raise ValueError(f"no committed version {to_version} under {root}")
    version = max(by_v) + 1
    _commit(
        root,
        {
            "version": version,
            "dir": by_v[to_version]["dir"],
            "note": f"rollback to v{to_version}",
        },
    )
    return version


def _commit(root: str, manifest: dict) -> None:
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(mdir, f"{manifest['version']}.json"))


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: latest committed version by default, or any
    historical version by number. Plain ``spark.read.parquet`` under the
    hood, so pushdown/pruning work unchanged."""
    manifests = list_snapshots(root)
    if not manifests:
        raise ValueError(f"no committed snapshots under {root}")
    if version is None:
        m = manifests[-1]
    else:
        by_v = {mm["version"]: mm for mm in manifests}
        if version not in by_v:
            raise ValueError(f"no committed version {version} under {root}")
        m = by_v[version]
    return spark.read.parquet(os.path.join(root, m["dir"]))


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level diff between two committed versions: per-key multiset
    fingerprints joined full-outer, rows classified added / removed /
    changed / unchanged.

    Robust to the cases a naive row-hash join gets wrong:

    - **duplicate keys** — each side aggregates to ONE row per key
      (count + an order-independent sum of row hashes), so dup-key fan-out
      cannot manufacture spurious diff rows; a key whose duplicate
      multiplicity changes is reported ``changed``.
    - **null vs sentinel** — every value column contributes an explicit
      ``isNull`` boolean ahead of its string form to the hash, so a
      genuine NUL/empty string is distinguishable from NULL (Spark's hash
      functions skip null arguments, which is also why interleaving the
      flags keeps adjacent columns positionally unambiguous).
    - **schema drift** — columns are compared over the INTERSECTION of
      the two versions' non-key columns; added/dropped columns cannot
      raise, and (documented limitation) a row whose only difference
      lies in a non-shared column reads ``unchanged``.

    The row-hash sum is carried as decimal(38,0), which cannot overflow
    under ANSI mode for any feasible per-key row count.

    Output: key columns + ``change_type``. Each side's groupBy and the
    full-outer join shuffle on the same key, so AQE plans one exchange
    pair; both sides are parquet scans of immutable version dirs — the
    diff of a 100-TB table against its predecessor is sized by the
    table, not by the version history."""
    old = read_snapshot(spark, root, v_old)
    new = read_snapshot(spark, root, v_new)
    shared = set(old.columns) & set(new.columns)
    val_cols = [c for c in new.columns if c not in key_cols and c in shared]

    def fp(df: DataFrame, name: str) -> DataFrame:
        parts = []
        for c in val_cols:
            parts.append(F.col(c).isNull())
            parts.append(F.col(c).cast("string"))
        row_h = F.xxhash64(*parts) if parts else F.lit(0).cast("long")
        return (
            df.select(*key_cols, row_h.alias("__h__"))
            .groupBy(*key_cols)
            .agg(
                F.count(F.lit(1)).alias(f"{name}_n"),
                F.sum(F.col("__h__").cast("decimal(38,0)")).alias(f"{name}_s"),
            )
        )

    joined = fp(old, "old").join(fp(new, "new"), key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("old_n").isNull(), F.lit("added"))
        .when(F.col("new_n").isNull(), F.lit("removed"))
        .when(
            (F.col("old_n") != F.col("new_n"))
            | (F.col("old_s") != F.col("new_s")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
