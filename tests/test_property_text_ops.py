"""Hypothesis property tests for the round-8 text/crawl operators:
idempotence and conservation laws that must hold for ANY input, not just
the corpus fixtures — the shapes humans skip (empty strings, runs of
separators, adversarial near-URL strings, single-token docs)."""

from __future__ import annotations

import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ASCII words (the extraction/canonicalization domain); no
# angle brackets or ampersands so plain-text expectations are exact
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.,!?-",
    min_size=1,
    max_size=8,
)
_WORDS = st.lists(_WORD, min_size=0, max_size=30)


@given(words=_WORDS)
@_SETTINGS
def test_html_to_text_plain_text_fixpoint(spark, words):
    """Tag-free text is a fixpoint (modulo whitespace collapse): the
    extractor must never eat or invent content characters."""
    from sdc_spark.functions.text import html_to_text

    raw = "  ".join(words)
    df = spark.createDataFrame([(0, raw)], "id long, t string")
    got = df.select(html_to_text("t").alias("o")).collect()[0].o
    assert got == " ".join(w for w in words if w)


@given(words=_WORDS)
@_SETTINGS
def test_html_to_text_idempotent(spark, words):
    """extract(extract(x)) == extract(x) — re-running the cleaner on
    already-clean text must be a no-op (pipelines re-run stages)."""
    from sdc_spark.functions.text import html_to_text

    raw = "<p>" + " ".join(words) + "</p><br>"
    df = spark.createDataFrame([(0, raw)], "id long, t string")
    once = df.select(html_to_text("t").alias("o"))
    twice = once.select(html_to_text("o").alias("o"))
    assert once.collect()[0].o == twice.collect()[0].o


_PARAM = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=5)


@given(
    host=st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=1, max_size=10),
    path=st.lists(_PARAM, min_size=0, max_size=3),
    params=st.lists(st.tuples(_PARAM, _PARAM), min_size=0, max_size=4),
    frag=st.one_of(st.none(), _PARAM),
)
@_SETTINGS
def test_canonical_url_idempotent(spark, host, path, params, frag):
    """canonical(canonical(u)) == canonical(u) for any generated URL —
    the property that makes the canonical form a JOIN KEY (re-canonizing
    an already-deduped crawl must not re-shuffle groups)."""
    from sdc_spark.functions.text import canonical_url

    url = "https://" + host + ".com/" + "/".join(path)
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)
    if frag is not None:
        url += "#" + frag
    df = spark.createDataFrame([(0, url)], "id long, u string")
    once = df.select(canonical_url("u").alias("c")).collect()[0].c
    twice = (
        df.select(canonical_url("u").alias("c"))
        .select(canonical_url("c").alias("c"))
        .collect()[0]
        .c
    )
    assert once == twice, (url, once, twice)


@given(words=st.lists(_WORD, min_size=1, max_size=60))
@_SETTINGS
def test_cdc_chunks_conserve_tokens(spark, words):
    """Chunking must partition the token stream: counts sum to the doc's
    token count, chunk indexes are contiguous from 0, and re-running is
    bit-identical (hash-driven boundaries, no randomness)."""
    from sdc_spark.operators.dedup import content_defined_chunks

    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    rows = content_defined_chunks(df, "text", "doc_id").collect()
    assert sum(r.n_tokens for r in rows) == len(words)
    assert sorted(r.chunk_idx for r in rows) == list(range(len(rows)))
    again = content_defined_chunks(df, "text", "doc_id").collect()
    assert sorted((r.chunk_idx, r.chunk_hash) for r in rows) == sorted(
        (r.chunk_idx, r.chunk_hash) for r in again
    )


def test_operators_utf8_safe(spark):
    """The ORACLES pin the all-ASCII corpus, but the operators themselves
    must be multibyte-safe (real crawls aren't ASCII): html_to_text
    keeps non-ASCII content characters, canonical_url passes multibyte
    path segments through, and CDC chunking conserves multibyte
    tokens."""
    from sdc_spark.functions.text import canonical_url, html_to_text
    from sdc_spark.operators.dedup import content_defined_chunks

    text = "naïve café über 日本語 emoji🙂 mixed"
    df = spark.createDataFrame([(0, f"<p>{text}</p>")], "id long, t string")
    assert df.select(html_to_text("t").alias("o")).collect()[0].o == text

    url = "https://Ex.com/ünï/päth?utm_source=x&k=väl#frag"
    got = spark.createDataFrame([(0, url)], "id long, u string").select(
        canonical_url("u").alias("c")
    ).collect()[0].c
    assert got == "https://ex.com/ünï/päth?k=väl"

    words = ["日本語", "naïve", "café"] * 20
    rows = content_defined_chunks(
        spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string"),
        "text",
        "doc_id",
    ).collect()
    assert sum(r.n_tokens for r in rows) == len(words)
