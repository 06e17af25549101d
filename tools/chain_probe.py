"""Chain-graph probe: components_star vs min-label propagation on the
graph shape star exists for.

The dedup-pair corpora in the test data produce near-clique components
(diameter 2-3), where min-label LP converges in a few rounds and wins on
constant factors. Chain-shaped components (temporally drifting near-dup
chains, redirect chains) have diameter = chain length: LP needs one round
PER HOP (and loudly raises past max_iter), while large-star/small-star
halves tree heights every alternation — O(log n) rounds regardless of
diameter. This probe measures exactly that on synthetic chains, scaling
node count k in {1, 4, 16} at fixed chain length, plus one long-chain
case where LP is structurally unable to finish.

Prints one JSON line:
{"chain_len": L, "scales": {k: {"nodes": n, "star_s": s, "star_rounds": r,
 "lp_s": s|null, "lp_note": ...}}, "long_chain": {...}}

Usage: python tools/chain_probe.py [chain_len=32] [base_chains=300]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.dedup import components_star, dedup_components
from sdc_spark.session import get_spark


def chain_edges(spark, n_chains: int, length: int):
    """Edges (i, i+1) within each of n_chains disjoint chains."""
    n = n_chains * length
    nodes = spark.range(n).select(F.col("id").cast("long").alias("u"))
    return (
        nodes.filter((F.col("u") % length) != length - 1)
        .select(F.col("u").alias("doc_a"), (F.col("u") + 1).alias("doc_b"))
    )


def check_labels(out, length: int) -> int:
    """Every node's component must be its chain's minimum node id."""
    bad = out.filter(
        F.col("component") != (F.col("doc") - F.col("doc") % length)
    ).count()
    return bad


def run_star(spark, n_chains, length):
    edges = chain_edges(spark, n_chains, length)
    t0 = time.time()
    out = components_star(edges, max_iter=40)
    bad = check_labels(out, length)
    dt = time.time() - t0
    assert bad == 0, f"components_star mislabeled {bad} nodes"
    return dt


def run_lp(spark, n_chains, length, max_iter):
    edges = chain_edges(spark, n_chains, length)
    t0 = time.time()
    try:
        out = dedup_components(edges, max_iter=max_iter)
        bad = check_labels(out, length)
        assert bad == 0, f"dedup_components mislabeled {bad} nodes"
        return time.time() - t0, "converged"
    except RuntimeError as e:
        return None, f"raised after {time.time()-t0:.1f}s: {e}"


def main() -> None:
    length = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    spark = get_spark("chain_probe")
    result = {"chain_len": length, "scales": {}}
    for k in (1, 4, 16):
        n_chains = base * k
        star_s = run_star(spark, n_chains, length)
        lp_s, lp_note = run_lp(spark, n_chains, length, max_iter=length + 2)
        result["scales"][k] = {
            "nodes": n_chains * length,
            "star_s": round(star_s, 2),
            "lp_s": None if lp_s is None else round(lp_s, 2),
            "lp_note": lp_note,
        }
        print(f"k={k}: {result['scales'][k]}", file=sys.stderr)
    # one long chain: diameter 512 >> default max_iter 25 -> LP must raise
    lp_s, lp_note = run_lp(spark, 4, 512, max_iter=25)
    star_s = run_star(spark, 4, 512)
    result["long_chain"] = {
        "length": 512,
        "star_s": round(star_s, 2),
        "lp_s": None if lp_s is None else round(lp_s, 2),
        "lp_note": lp_note,
    }
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    raise SystemExit(main())
