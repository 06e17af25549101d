"""Determinism gate: run registered queries N times in one session and
compare order-insensitive value hashes across runs. Catches the class of
bug that produced round 3's pack_sequences flake (plan-branch re-execution
re-sampling range boundaries) — an oracle comparison can pass on a lucky
schedule; same-session repetition is the direct test.

Usage:  python tools/determinism_check.py [sf_dir] [runs] [query ...]
        (no query args -> the state-heavy default set)
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from sdc_spark.session import get_spark  # noqa: E402

# Queries whose machinery carries cross-run hazard potential: distributed
# scans/boundary fix-ups, checkpointed fan-outs, seeded clustering, AQE-
# sensitive layouts.
DEFAULT_SET = [
    "pack_sequences",
    "merge_asof_backward",
    "merge_asof_nearest",
    "series_interpolate",
    "series_ffill",
    "series_expanding",
    "window_cumsum",
    "semantic_dedup",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ml_kmeans",
    "dedup_minhash_lsh",
    "dedup_components",
    "sample_stratified",
    "sample_source_mix",
    "split_train_val_test",
    # round-6 additions: histogram/decay scans, incremental LSH, PQ
    # codebooks, cluster-unit split, BPE merge learning
    "series_expanding_quantile",
    "series_ewm_mean",
    "series_ewm_var",
    "groupby_ewm_mean",
    "dedup_incremental",
    "split_leakage_safe",
    "ann_pq_topk",
    "text_bpe_tokenize",
    # round-4 additions: md5-uniform draws, min_by/max_by bars, Gram
    # partials (partition-order float sums), first-occurrence rewrite
    "sample_weighted",
    "shuffle_shard_epoch",
    "ts_resample_ohlc",
    "passage_dedup_rewrite",
    "ml_pca_project",
    "table_diff",
    # round-9/10 additions: persisted-index lifecycle (table writes +
    # appends must not leak across runs), AQE-dependent plans, runtime
    # bloom pruning, driver-solve pagerank, multibyte regex chains
    "dedup_incremental_persisted",
    "dedup_index_ingest_loop",
    "ann_lsh_multiprobe",
    "text_line_dedup",
    "data_recipe_mix",
    "join_aqe_skew",
    "text_quality_classifier",
    "join_runtime_bloom",
    "text_multibyte_pipeline",
    "graph_pagerank",
    "text_tfidf_topk",
    "ann_ivf_persisted",
    "ann_ivf_ingest_loop",
    # round-10 continuation: rank windows over materialized top-k lists,
    # components-fed argmax survivor selection, double-ended rank trims
    "retrieval_bm25",
    "retrieval_hybrid_rrf",
    "dedup_containment",
    "dedup_keep_best_quality",
    "stats_robust_means",
    "pipeline_dump_release",
    "retrieval_index_ingest_loop",
    "retrieval_index_takedown",
    # distributed-global-position consumers (range-boundary hazard class)
    "curation_curriculum",
    "curation_balanced_shards",
]


def result_hash(df) -> str:
    rows = df.collect()
    canon = sorted(
        tuple(
            f"{v:.9g}" if isinstance(v, float) else str(v) for v in row
        )
        for row in rows
    )
    h = hashlib.sha256()
    for r in canon:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return f"{len(rows)}:{h.hexdigest()[:16]}"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    rest = [a for a in args if "/" not in a]
    runs = int(rest[0]) if rest and rest[0].isdigit() else 3
    names = [a for a in rest if not a.isdigit()] or DEFAULT_SET

    import sdc_spark.plans.all  # noqa: F401
    from sdc_spark.plans.registry import QUERIES

    spark = get_spark("determinism_check")
    n_ok = n_bad = 0
    for name in names:
        if name not in QUERIES:
            print(f"SKIP  {name}: not registered")
            continue
        hashes = []
        try:
            for _ in range(runs):
                hashes.append(result_hash(QUERIES[name](spark, sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if len(set(hashes)) == 1:
            print(f"OK    {name}: {runs}x {hashes[0]}")
            n_ok += 1
        else:
            print(f"FLAKY {name}: {hashes}")
            n_bad += 1
    print(f"\n{n_ok} deterministic, {n_bad} flaky/error")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
