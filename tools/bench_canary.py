"""Fresh-session bench canary — the variance-controlled protocol behind
round-over-round drift attribution (BENCH_NOTES).

The full bench (bench.py) runs ~260 queries through a handful of
long-lived JVMs; cross-query JVM state (JIT tiers, GC history, code
cache, block-manager churn) plus host load confounds small per-query
deltas between rounds. This tool removes the cross-query confounder:
each canary query runs in its OWN subprocess (fresh JVM + fresh
SparkSession), warm-once-time-once inside that session, repeated N
times, and reports per-query median + spread. Two runs of this tool at
idle load are directly comparable; a code regression shows up as a
median shift well outside the reported spread.

Usage:
    python tools/bench_canary.py [--repeats N] [--sf DIR] [--out FILE]
    python tools/bench_canary.py --one QUERY --sf DIR   (internal)

Output: one JSON object {query: {"median": s, "min": s, "max": s,
"times": [...]}, "_meta": {...}} — written to --out (default
bench_canary.json) and printed.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ~20 queries spanning the operator families: relational agg/join/window,
# order machinery, asof, dedup (LSH + ngram + substring), retrieval,
# ANN, text, curation, streaming twin — the set drift attribution reads.
CANARY = [
    "q1_pricing_summary",
    "q9_nation_profit",
    "agg_stats",
    "sort_values",
    "nlargest_topk",
    "join_multikey",
    "merge_asof_backward",
    "groupby_agg_core",
    "window_topk_per_group",
    "rolling_corr_cov",
    "series_ffill",
    "window_tumbling_agg",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_substring_dedup",
    "text_decontaminate",
    "retrieval_bm25",
    "retrieval_hybrid_rrf",
    "ann_cosine_topk",
    "pack_sequences",
]


def run_one(query: str, sf_dir: str) -> float:
    """Executed in the child: fresh session, warm once, time once."""
    import sdc_spark.plans.all  # noqa: F401
    from sdc_spark.plans.registry import QUERIES
    from sdc_spark.session import get_spark

    spark = get_spark(f"canary-{query}")
    fn = QUERIES[query]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="bench_canary.json")
    ap.add_argument("--one", default=None, help="internal: run one query")
    ap.add_argument("--queries", default=None,
                    help="comma-separated override of the canary set")
    args = ap.parse_args()

    if args.one:
        print(json.dumps({"query": args.one, "sec": run_one(args.one, args.sf)}))
        return

    names = args.queries.split(",") if args.queries else CANARY
    results: dict = {}
    loads = []
    for rep in range(args.repeats):
        for name in names:
            loads.append(os.getloadavg()[0])
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", name, "--sf", args.sf],
                capture_output=True, text=True, timeout=600, cwd=REPO,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not line:
                results.setdefault(name, {"times": []})["times"].append(-1.0)
                sys.stderr.write(f"FAIL {name}: {proc.stderr[-500:]}\n")
                continue
            sec = json.loads(line[-1])["sec"]
            results.setdefault(name, {"times": []})["times"].append(sec)
            print(f"rep{rep} {name}: {sec:.2f}s", flush=True)
    for name, r in results.items():
        ok = [t for t in r["times"] if t >= 0]
        if ok:
            r["median"] = round(statistics.median(ok), 3)
            r["min"] = round(min(ok), 3)
            r["max"] = round(max(ok), 3)
            r["spread_pct"] = round(
                100.0 * (max(ok) - min(ok)) / max(r["median"], 1e-9), 1
            )
    results["_meta"] = {
        "repeats": args.repeats,
        "sf": args.sf,
        "loadavg_median": round(statistics.median(loads), 2) if loads else None,
        "protocol": "fresh JVM per query, warm-once-time-once",
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("median") for k, v in results.items()
                      if k != "_meta"}))


if __name__ == "__main__":
    main()
