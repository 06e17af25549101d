"""Property tests for the round-4 curation/warehouse operators."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.curation import weighted_sample_per_group


@pytest.fixture(scope="module")
def weighted_pool(spark):
    # one group, strongly skewed weights: heavy ids should dominate picks
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 400,
            "id": np.arange(400),
            "w": np.where(np.arange(400) < 40, 100.0, 1.0),  # 10% heavy x100
        }
    )
    return spark.createDataFrame(pdf)


def test_weighted_sample_bias_and_exactness(weighted_pool):
    out = weighted_sample_per_group(weighted_pool, "g", "id", "w", 20).toPandas()
    assert len(out) == 20
    assert out["id"].is_unique
    # heavy rows are 10% of the pool but carry ~92% of total weight;
    # a uniform sample of 20 would include ~2 heavy rows, weighted ~18
    heavy = (out["id"] < 40).sum()
    assert heavy >= 12, f"weighted draw under-selected heavy rows: {heavy}/20"


def test_weighted_sample_deterministic(weighted_pool):
    a = weighted_sample_per_group(weighted_pool, "g", "id", "w", 20).toPandas()
    b = weighted_sample_per_group(weighted_pool, "g", "id", "w", 20).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True),
    )


def test_scd2_intervals_well_formed(spark, sf_dir):
    from sdc_spark.plans.curation2 import scd2_customer_status

    hist = scd2_customer_status(spark, sf_dir).toPandas()
    assert len(hist) > 0
    by_c = hist.sort_values(["custkey", "valid_from"])
    for _, g in by_c.groupby("custkey"):
        # exactly one open (current) interval per customer, and it is last
        assert g["is_current"].sum() == 1
        assert bool(g.iloc[-1]["is_current"])
        # each interval closes exactly where the next opens
        closes = g["valid_to"].iloc[:-1].tolist()
        opens = g["valid_from"].iloc[1:].tolist()
        assert closes == opens
        # consecutive statuses always differ (changes-only compression)
        ss = g["status"].tolist()
        assert all(x != y for x, y in zip(ss, ss[1:]))


def test_shuffle_shard_balanced(spark, sf_dir):
    from sdc_spark.plans.curation2 import shuffle_shard_epoch

    out = shuffle_shard_epoch(spark, sf_dir)
    sizes = out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).toPandas()
    n, total = len(sizes), sizes["n"].sum()
    # hash sharding at 500 docs / 64 shards: no shard should be empty-ish
    # pathological or hugely overloaded (chi-square style loose bound)
    assert n >= 50
    assert sizes["n"].max() <= 6 * total / 64


def test_recipe_mix_tokens_budget_and_determinism(spark, sf_dir):
    """Token-budget recipe mixing: the kept corpus must hold roughly
    budget_frac of total tokens, per-source keeps must follow the weight
    ordering where sources are same-sized, never upsample, and the keep
    set must be bit-identical across runs (md5 threshold, no RNG)."""
    from sdc_spark.operators.curation import recipe_mix_tokens
    from sdc_spark.functions.text import ws_token_count
    from sdc_spark.sources.readers import read_table

    doc = read_table(spark, sf_dir, "documents")
    weights = {f"src{i}": float(1 + i % 4) for i in range(20)}
    kept = recipe_mix_tokens(doc, "text", "doc_id", "source", weights, 0.5)

    total = doc.agg(F.sum(ws_token_count("text"))).collect()[0][0]
    got = kept.agg(F.sum(ws_token_count("text"))).collect()[0][0]
    # Bernoulli keep at 500 docs: generous band around the 50% target
    assert 0.30 * total <= got <= 0.70 * total, (got, total)

    # never upsamples: kept is a subset of the corpus
    assert kept.count() <= doc.count()
    assert (
        kept.join(doc.select("doc_id"), "doc_id", "left_anti").count() == 0
    )

    # deterministic: same keep set on a rebuilt plan
    again = recipe_mix_tokens(doc, "text", "doc_id", "source", weights, 0.5)
    ids = lambda df: sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids(kept) == ids(again)

    # budget monotonicity: a bigger budget keeps a superset
    bigger = recipe_mix_tokens(doc, "text", "doc_id", "source", weights, 0.9)
    assert set(ids(kept)) <= set(ids(bigger))


def test_hashed_linear_score_bounded_and_deterministic(spark):
    """Classifier inference: scores in (0,1), empty text scores exactly
    sigmoid(0)=0.5, identical text scores identically, and the score
    reacts to content (not constant)."""
    from sdc_spark.functions.text import hashed_linear_score

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "zzz qqq jjj xxx www kkk vvv"),
        (3, ""),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.s
        for r in df.select("id", hashed_linear_score("text").alias("s")).collect()
    }
    assert all(0.0 < v < 1.0 for v in got.values()), got
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert got[3] == got[4] == 0.5


def test_curriculum_phases_matches_ntile(spark):
    """Closed-form phase assignment == ntile semantics for sizes where
    N mod k != 0 (first r phases one bigger) and N < k (empty phases)."""
    from sdc_spark.operators.curation import curriculum_phases

    for n, k in [(10, 4), (7, 3), (2, 5), (12, 4), (1, 1)]:
        df = spark.createDataFrame(
            [(i, float(i % 5)) for i in range(n)], "doc_id long, s double"
        )
        got = {
            r["doc_id"]: r["phase"]
            for r in curriculum_phases(df, ["s", "doc_id"], k).collect()
        }
        order = sorted(range(n), key=lambda i: (i % 5, i))
        q, r_ = divmod(n, k)
        want = {}
        pos = 0
        for p in range(1, k + 1):
            size = q + 1 if p <= r_ else q
            for _ in range(size):
                if pos < n:
                    want[order[pos]] = p
                    pos += 1
        assert got == want, (n, k)

    import pytest as _pt

    with _pt.raises(ValueError):
        curriculum_phases(spark.createDataFrame([(1, 1.0)], "doc_id long, s double"), ["s"], 0)


def test_snake_sharding_balance_and_semantics(spark):
    """Snake deal: shard is the boustrophedon function of the (weight
    desc, id) position, and per-shard totals stay within one heaviest
    item of each other on adversarial weights."""
    import pytest as _pt

    from sdc_spark.operators.curation import snake_sharding

    rows = [(i, float(100 - i)) for i in range(20)]  # strictly decreasing
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"]: r["shard"] for r in snake_sharding(df, "w", 4).collect()}
    # positions == doc_id here; snake of width 4: 0123 3210 0123 ...
    want = {}
    for pos in range(20):
        within = pos % 4
        want[pos] = within if (pos // 4) % 2 == 0 else 3 - within
    assert got == want
    # balance bound: max-min per-shard total <= heaviest weight
    totals = {}
    for i, w in rows:
        totals[got[i]] = totals.get(got[i], 0.0) + w
    assert max(totals.values()) - min(totals.values()) <= 100.0
    assert len(totals) == 4
    with _pt.raises(ValueError):
        snake_sharding(df, "w", 0)
