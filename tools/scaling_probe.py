"""Scaling-slope probe: replicate the sf0.1 fact tables k× (id-offset so
keys stay unique and dedup/semantics stay meaningful), run representative
heavy queries at both scales, and report the time ratio against the data
ratio. A plan that survives 100× shows a near-linear slope here; a hidden
quadratic or single-partition funnel shows up as ratio >> k.

Writes the scaled tables under /tmp (never touches /root/testdata) and
prints one JSON line: {"k": k, "queries": {name: {"t1": s, "tk": s,
"ratio": r}}}.

Usage: python tools/scaling_probe.py [k] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/sdc_spark_scale"

# fact tables replicated with id offsets; dims copied as-is
FACT_OFFSETS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_nation_profit",
    "groupby_agg_core",
    "merge_asof_backward",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_decontaminate",
    "pack_sequences",
    "window_topk_per_group",
    "series_ffill",
    # round-6 additions: histogram/decay scans, incremental LSH, PQ, LM
    "series_expanding_quantile",
    "series_ewm_mean",
    "dedup_incremental",
    "ann_pq_topk",
    "text_bigram_lm_score",
    "text_bpe_tokenize",
    "graph_pagerank",
]


def build_scaled(spark, k: int) -> str:
    out = f"{OUT}/k{k}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, (key, off) in FACT_OFFSETS.items():
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = [
            base.withColumn(key, (F.col(key) + F.lit(i * off)).cast("long"))
            for i in range(k)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    open(marker, "w").close()
    return out


def timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    k = int(args[0]) if args and args[0].isdigit() else 4
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    import sdc_spark.plans.all  # noqa: F401
    from sdc_spark.plans.registry import QUERIES

    spark = get_spark("scaling_probe")
    scaled = build_scaled(spark, k)
    out = {}
    for name in names:
        fn = QUERIES[name]
        timed(fn, spark, BASE)  # warm
        t1 = min(timed(fn, spark, BASE) for _ in range(2))
        tk = min(timed(fn, spark, scaled) for _ in range(2))
        out[name] = {"t1": round(t1, 3), "tk": round(tk, 3), "ratio": round(tk / t1, 2)}
        print(f"{name:28s} {t1:7.2f}s -> {tk:7.2f}s  ratio {tk / t1:5.2f} (data x{k})", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"k": k, "queries": out}))


if __name__ == "__main__":
    main()
