"""Hypothesis property tests for BM25, RRF, and containment pairs:
differentials against transparent pure-Python implementations on random
corpora — the shapes fixtures skip (all-identical docs, single-term
corpora, docs made entirely of the query terms, empty overlap)."""

from __future__ import annotations

import math
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["red", "blue", "green", "spark", "query", "x1", "y2"]
_DOC = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _py_bm25(toks, terms, k1=1.2, b=0.75):
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


@given(corpus=_CORPUS, terms=st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3, unique=True))
@_SETTINGS
def test_bm25_matches_reference_impl(spark, corpus, terms):
    from sdc_spark.operators.retrieval import bm25_scores

    rows = [(i, " ".join(doc)) for i, doc in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_hit_terms"], r["score"])
        for r in bm25_scores(df, "text", "doc_id", list(terms)).collect()
    }
    want = _py_bm25({i: doc for i, doc in enumerate(corpus)}, list(terms))
    assert set(got) == set(want)
    for i, (hits, score) in want.items():
        assert got[i][0] == hits
        assert abs(got[i][1] - score) <= 1e-9 * max(1.0, abs(score))


@given(
    ranks_a=st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True),
    ranks_b=st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True),
)
@_SETTINGS
def test_rrf_matches_reference_impl(spark, ranks_a, ranks_b):
    """Fused score = exact Σ 1/(60+rank) over the rankers listing the id;
    ids from either list all present; n_rankers counts memberships."""
    from sdc_spark.operators.retrieval import rrf_fuse

    if not ranks_a and not ranks_b:
        return
    a = [(doc, r + 1) for r, doc in enumerate(ranks_a)]
    b = [(doc, r + 1) for r, doc in enumerate(ranks_b)]
    frames = []
    for lst in (a, b):
        if lst:
            frames.append(spark.createDataFrame(lst, "doc long, rank int"))
    got = {
        r["doc"]: (r["n_rankers"], r["rrf_score"])
        for r in rrf_fuse(frames, k=60).collect()
    }
    want: dict[int, tuple[int, float]] = {}
    for lst in (a, b):
        for doc, rank in lst:
            n, s = want.get(doc, (0, 0.0))
            want[doc] = (n + 1, s + 1.0 / (60 + rank))
    assert set(got) == set(want)
    for doc, (n, s) in want.items():
        assert got[doc][0] == n
        assert abs(got[doc][1] - s) <= 1e-12


@given(corpus=_CORPUS)
@_SETTINGS
def test_containment_matches_brute_force(spark, corpus):
    """Pairs = exactly those with max-side distinct-trigram containment
    >= 0.5 (brute force over the same normalized token trigrams)."""
    from sdc_spark.operators.dedup import ngram_containment_pairs

    rows = [(i, " ".join(doc)) for i, doc in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["cont_a"], r["cont_b"])
        for r in ngram_containment_pairs(
            df, "text", "doc_id", threshold=0.5, max_doc_freq=None
        ).collect()
    }

    def gramset(doc):
        toks = " ".join(doc).split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            ga, gb = gramset(corpus[i]), gramset(corpus[j])
            inter = len(ga & gb)
            if inter == 0:
                continue
            ca, cb = inter / len(ga), inter / len(gb)
            if max(ca, cb) >= 0.5:
                want[(i, j)] = (ca, cb)
    assert set(got) == set(want)
    for k, (ca, cb) in want.items():
        assert abs(got[k][0] - ca) <= 1e-12 and abs(got[k][1] - cb) <= 1e-12
