"""Memory-pressure probe: run the stateful dedup/components family at a
DELIBERATELY small JVM heap on the k-replicated corpus and demonstrate
spill-not-OOM — the collect_set verify states, LSH banding shuffles, and
iterative component rounds must degrade to disk, never die.

Why this matters at 100 TB: executor heaps are fixed while state grows
with data; an operator family is only fleet-safe if its aggregation
states go through Spark's spilling aggregation paths (ObjectHashAggregate
sort-based fallback, MEMORY_AND_DISK blocks for materialized
intermediates) instead of assuming residency. The probe pins that
behavior: same queries, same k16 corpus as SCALING.md's slope runs, heap
floored (default 1/20th of the bench default), materialization forced to
the cluster-durable ``persist`` mode with a reliable checkpoint dir — and
the row counts must MATCH the big-heap slope runs.

The floor is expressed as heap-per-concurrent-task (heap / cores), the
quantity that actually transfers to a fleet: local[32] on a 2 GiB heap is
64 MB/task — far below any real executor profile — so the probe pins the
core count too (default 8 → 256 MB/task at 2g, a harsh but realistic
floor; production guidance is >= 512 MB-1 GB per core).

Usage: python tools/memory_probe.py [heapsize e.g. 2g] [cores] [k] [query ...]
Prints one JSON line:
  {"heap": "...", "cores": c, "k": k,
   "queries": {name: {"rows": n, "sec": s}},
   "peak_heap_mb": m, "max_heap_mb": m}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "dedup_components_star",
    "dedup_cluster_sizes",
    "split_leakage_safe",
]


def run_child(heap: str, cores: int, k: int, names: list[str]) -> None:
    """Re-exec under the floored heap (driver memory must be set before
    JVM launch — it cannot be lowered on a live session)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = heap
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["_SDC_MEMPROBE_CHILD"] = "1"
    cmd = [sys.executable, __file__, heap, str(cores), str(k), *names]
    raise SystemExit(subprocess.call(cmd, env=env))


def child_main(heap: str, cores: int, k: int, names: list[str]) -> None:
    from sdc_spark.session import get_spark
    from tools.scaling_probe import build_scaled

    import sdc_spark.plans.all  # noqa: F401
    from sdc_spark.plans.registry import QUERIES

    # Shuffle partitions sized to DATA, not cores — the cluster_conf rule
    # (partitions ≈ data / 256 MB) is load-bearing under a floored heap:
    # with partitions == cores (8), the k16 pair-count aggregation holds
    # ~1/8th of a multi-GB shuffle per task, spills dozens of times, and
    # then OOMs allocating the per-spill-file read buffers in the merge
    # phase. At 64 partitions every aggregation state fits-or-spills
    # shallowly and the same queries complete inside the floor.
    spark = get_spark("memory_probe", shuffle_partitions=max(64, cores))
    spark.conf.set("spark.sdc.materialize.mode", "persist")
    spark.conf.set("spark.sdc.checkpoint.dir", "/tmp/sdc_spark_memprobe_ckpt")
    # Broadcast threshold scales with heap (~heap/128): the session
    # default (64 MB compressed) is sized for >= 4 GB/core executors — a
    # 64 MB-estimated build side deserializes to several hundred MB of
    # rows and kills a 2 GB driver with "Not enough memory to build and
    # broadcast". Same rule a real floored fleet applies.
    heap_mb = int(heap.rstrip("gGmM")) * (1024 if heap[-1] in "gG" else 1)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        str(max(4, heap_mb // 128) * 1024 * 1024),
    )
    scaled = build_scaled(spark, k)

    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    peak = [0]
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            peak[0] = max(peak[0], rt.totalMemory() - rt.freeMemory())
            time.sleep(0.2)

    t = threading.Thread(target=sample, daemon=True)
    t.start()

    out = {}
    for name in names:
        t0 = time.time()
        rows = QUERIES[name](spark, scaled).count()
        out[name] = {"rows": rows, "sec": round(time.time() - t0, 2)}
        print(f"{name:26s} {rows:>10d} rows  {out[name]['sec']:7.2f}s", file=sys.stderr)
        spark.catalog.clearCache()
    stop.set()
    print(
        json.dumps(
            {
                "heap": heap,
                "cores": cores,
                "k": k,
                "queries": out,
                "peak_heap_mb": round(peak[0] / 1e6),
                "max_heap_mb": round(rt.maxMemory() / 1e6),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    heap = args[0] if args else "2g"
    cores = int(args[1]) if len(args) > 1 and args[1].isdigit() else 8
    k = int(args[2]) if len(args) > 2 and args[2].isdigit() else 16
    names = args[3:] or DEFAULT_QUERIES
    if os.environ.get("_SDC_MEMPROBE_CHILD"):
        child_main(heap, cores, k, names)
    else:
        run_child(heap, cores, k, names)


if __name__ == "__main__":
    main()
