"""Physical-plan invariants as CI: the scale-critical plan properties the
explain audit checks interactively, pinned so a regression (lost
broadcast, reintroduced single-partition exchange, surprise sort-merge
join) fails the suite rather than surfacing at 100 TB.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import sdc_spark.plans.all  # noqa: F401
from sdc_spark.plans.registry import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_star_joins_broadcast_dims(spark, sf_dir):
    """Q5-shape: every dimension side broadcast, no sort-merge join."""
    plan = plan_of(spark, sf_dir, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_q9_profit_no_smj(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q9_nation_profit")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_order_machinery_never_single_partitions_data(spark, sf_dir):
    """The distributed-order surface (ffill, cumsum, topk-per-group) must
    not contain a full-data Exchange SinglePartition. P-row offset tables
    hash-partition on the non-foldable zero key, so any SinglePartition
    exchange left is a regression."""
    for q in ("series_ffill", "window_cumsum", "window_topk_per_group"):
        plan = plan_of(spark, sf_dir, q)
        assert "Exchange SinglePartition" not in plan, f"{q}:\n{plan}"


def test_topk_uses_take_ordered(spark, sf_dir):
    """Deterministic top-k must compile to TakeOrderedAndProject, not a
    global sort."""
    plan = plan_of(spark, sf_dir, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_filters_reach_parquet_scan(spark, sf_dir):
    """Predicate pushdown: the Q6-shape filter must appear in
    PushedFilters on the lineitem scan."""
    # the PushedFilters list is elided with "..." in long plan strings, so
    # match the prefix rather than a closed bracket
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    pushed = re.findall(r"PushedFilters: \[[^\]\n]*", plan)
    assert any("GreaterThan" in p or "LessThan" in p for p in pushed), plan


def test_minhash_verify_join_not_cartesian(spark, sf_dir):
    """The LSH candidate join must be an equi-join (band, bhash) — a
    cartesian/broadcast-nested-loop here means the banding predicate was
    lost and the plan is O(n²)."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan, plan


def test_weighted_sample_partial_topk(spark, sf_dir):
    """sample_weighted must get the WindowGroupLimit partial top-k (the
    map-side pre-filter before the shuffle) — losing it means every row
    crosses the wire."""
    plan = plan_of(spark, sf_dir, "sample_weighted")
    assert "WindowGroupLimit" in plan, plan


def test_stats_profile_single_scan(spark, sf_dir):
    """The column profiler claims ONE pass: exactly one FileScan in the
    executed plan (a unionAll unpivot silently copies the aggregate
    subplan — regression guard)."""
    plan = plan_of(spark, sf_dir, "stats_profile")
    assert plan.count("FileScan") == 1, plan


def test_resample_single_aggregation(spark, sf_dir):
    """OHLC bars ride one partial+final aggregate: no Window, no Sort
    before the aggregation."""
    plan = plan_of(spark, sf_dir, "ts_resample_ohlc")
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "partial_min_by" in plan or "min_by" in plan, plan


def test_rag_chunking_no_exchange(spark, sf_dir):
    """rag_chunk_overlap is tokenise -> sequence -> posexplode -> project:
    one narrow stage, zero shuffles."""
    plan = plan_of(spark, sf_dir, "rag_chunk_overlap")
    assert "Exchange" not in plan, plan


def test_interval_merge_single_user_shuffle(spark, sf_dir):
    """interval_merge_overlaps: both window passes and the final aggregate
    reuse ONE hash partitioning on user_id — exactly one exchange, never a
    single-partition window."""
    plan = plan_of(spark, sf_dir, "interval_merge_overlaps")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_mad_anomaly_broadcasts_group_stats(spark, sf_dir):
    """events_anomaly_mad: the tiny per-group median/MAD tables come back
    as broadcast joins; the events scan is never sort-merge joined."""
    plan = plan_of(spark, sf_dir, "events_anomaly_mad")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_approx_sketch_no_expand(spark, sf_dir):
    """agg_approx_sketch mixes distinct and sketch aggregates; fused into
    one Aggregate, Catalyst rewrites via Expand (every input row
    duplicated per agg group — measured 4.6x slower at sf0.1). The query
    splits them into two cross-joined one-row aggregates; pin that no
    Expand node ever reappears."""
    plan = plan_of(spark, sf_dir, "agg_approx_sketch")
    assert "Expand" not in plan, plan


def test_ann_audit_broadcasts_queries(spark, sf_dir):
    """The ANN recall audits must keep the brute-force twin's broadcast
    shape (queries broadcast against one corpus scan) — a lost hint
    turns the exact side into a corpus x corpus sort-merge join."""
    plan = plan_of(spark, sf_dir, "ann_lsh_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
