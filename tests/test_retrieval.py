"""BM25 + RRF unit tests: differential against a pure-Python BM25 on a
tiny corpus, rank-list truncation semantics, fusion arithmetic, and the
TakeOrdered plan pin that makes depth-truncated ranking scale-safe."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sdc_spark.operators.retrieval import bm25_scores, rrf_fuse, topk_ranking

CORPUS = [
    (0, "spark query engine spark spark"),
    (1, "query planner and    Query optimizer"),
    (2, "nothing relevant here at all"),
    (3, "spark"),
    (4, "engine engine engine query"),
]
TERMS = ["spark", "query"]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            hits += 1
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(tk) / avgdl)
            )
        if hits:
            out[i] = (hits, s)
    return out


def test_bm25_differential(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_hit_terms"], r["score"])
        for r in bm25_scores(df, "text", "doc_id", TERMS).collect()
    }
    want = _py_bm25(CORPUS, TERMS)
    assert set(got) == set(want)
    for i, (hits, score) in want.items():
        assert got[i][0] == hits
        assert got[i][1] == pytest.approx(score, rel=1e-12)


def test_bm25_hits_only_and_validation(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    all_rows = bm25_scores(df, "text", "doc_id", TERMS, hits_only=False)
    assert all_rows.count() == len(CORPUS)
    zero = all_rows.filter(F.col("doc") == 2).collect()[0]
    assert zero["n_hit_terms"] == 0 and zero["score"] == 0.0
    with pytest.raises(ValueError):
        bm25_scores(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_topk_ranking_truncates_and_orders(spark):
    scored = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(10)], "doc long, s double"
    )
    top = topk_ranking(scored, "doc", "s", 4).collect()
    # scores: docs 2,5,8 have 2.0; 1,4,7 have 1.0 -> top4 = 2,5,8 then 1
    assert [(r["doc"], r["rank"]) for r in sorted(top, key=lambda r: r["rank"])] == [
        (2, 1), (5, 2), (8, 3), (1, 4)
    ]


def test_topk_ranking_is_take_ordered(spark):
    """The depth truncation must compile to TakeOrderedAndProject
    (map-side partial top-k), not a global sort. The rank list is
    materialized inside the operator, so the pin reads the captured
    segment plan, not the (checkpoint-fed) top-level plan."""
    from sdc_spark.materialize import start_plan_capture, stop_plan_capture

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc long, s double"
    )
    cap = start_plan_capture()
    try:
        topk_ranking(scored, "doc", "s", 5).collect()
    finally:
        stop_plan_capture()
    assert any("TakeOrderedAndProject" in p for p in cap)


def test_rrf_fuse_two_rankers(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc long, rank int")
    got = {r["doc"]: (r["n_rankers"], r["rrf_score"]) for r in rrf_fuse([a, b], k=60).collect()}
    assert got[2] == (2, pytest.approx(1 / 62 + 1 / 61, rel=1e-15))
    assert got[1] == (1, pytest.approx(1 / 61, rel=1e-15))
    assert got[4] == (1, pytest.approx(1 / 62, rel=1e-15))
    assert set(got) == {1, 2, 3, 4}


def test_bm25_multi_agrees_with_single_set(spark):
    """bm25_multi for one query whose terms equal the fixed set must score
    every hit doc identically (same Lucene form; multi aggregates float
    term scores, so compare at 1e-12 rel)."""
    import pytest as _pt

    from sdc_spark.operators.retrieval import bm25_multi

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(7, t) for t in TERMS], "qid int, term string"
    )
    multi = {
        r["doc"]: (r["n_hit_terms"], r["score"])
        for r in bm25_multi(df, q, "text", "doc_id").collect()
    }
    single = {
        r["doc"]: (r["n_hit_terms"], r["score"])
        for r in bm25_scores(df, "text", "doc_id", TERMS).collect()
    }
    assert set(multi) == set(single)
    for d, (hits, score) in single.items():
        assert multi[d][0] == hits
        assert multi[d][1] == _pt.approx(score, rel=1e-12)


def test_rrf_fuse_three_rankers_bit_reproducible(spark):
    """3+ rankers (the ADVICE r10 case): per-ranker contributions add in
    FIXED list order, so fused floats are bit-equal to the Python
    left-fold in the same order — and stable across repeated runs."""
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc", "rank"])
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], ["doc", "rank"])
    c = spark.createDataFrame([(3, 1), (1, 2), (5, 3)], ["doc", "rank"])
    expected = {}
    ranks_by_doc = {
        1: [1, None, 2], 2: [2, 1, None], 3: [3, 2, 1],
        4: [None, 3, None], 5: [None, None, 3],
    }
    for doc, rs in ranks_by_doc.items():
        s = 0.0
        n = 0
        for r in rs:  # fixed list order, like the operator
            if r is not None:
                s = s + 1.0 / (60.0 + r)
                n += 1
        expected[doc] = (n, s)
    for _ in range(3):
        got = {
            r["doc"]: (r["n_rankers"], r["rrf_score"])
            for r in rrf_fuse([a, b, c], k=60).collect()
        }
        assert got == expected  # exact ==, not approx: bit-equality
