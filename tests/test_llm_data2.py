"""Semantic/property tests for the second LLM-data batch: the pieces a
DuckDB oracle can't check (semantic_dedup's clustering is xxhash64-seeded)
plus determinism pins for the resampler."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.curation import resample_to_mix
from sdc_spark.operators.similarity import semantic_dedup
from sdc_spark.sources.readers import read_table


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_semantic_dedup_flags_are_true_near_dups(spark, sf_dir):
    """Every flagged duplicate must really be above-threshold cosine to its
    recorded survivor, the survivor must carry a lower id, and survivors
    must not be flagged."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, "vec_id", "embedding", n_cells=16, threshold=0.4)
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    rows = out.collect()
    dups = [r for r in rows if r.is_dup]
    assert dups, "semantic_dedup found nothing on the synthetic corpus"
    for r in dups:
        assert r.dup_of is not None and r.dup_of < r.vec_id
        c = _cos(vecs[r.vec_id], vecs[r.dup_of])
        assert c > 0.4, f"flagged pair ({r.dup_of},{r.vec_id}) cosine {c}"
    survivors = [r for r in rows if not r.is_dup]
    assert all(r.dup_of is None for r in survivors)
    # id-universe is preserved: one verdict per input vector
    assert len(rows) == len(vecs)


def test_semantic_dedup_deterministic(spark, sf_dir):
    """Same input -> bit-identical verdicts across plan re-executions."""
    emb = read_table(spark, sf_dir, "embeddings")
    a = sorted(
        map(tuple, semantic_dedup(emb, "vec_id", "embedding").drop("dup_of").collect())
    )
    b = sorted(
        map(tuple, semantic_dedup(emb, "vec_id", "embedding").drop("dup_of").collect())
    )
    assert a == b


def test_resample_to_mix_moves_toward_target(spark, sf_dir):
    """Over-represented strata are cut toward their target share;
    under-represented strata are kept whole; the decision is per-row
    deterministic (same rows kept on re-run)."""
    doc = read_table(spark, sf_dir, "documents")
    # 20 uniform sources; give src0..src9 weight 1 and src10..src19 weight 3
    mix = {f"src{i}": (1.0 if i < 10 else 3.0) for i in range(20)}
    kept = resample_to_mix(doc, "source", "doc_id", mix)
    per = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_src = {r.source: r.n for r in doc.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # weight-3 sources have target share 3/40 > actual 1/20 -> kept whole
    for i in range(10, 20):
        assert per[f"src{i}"] == n_src[f"src{i}"]
    # weight-1 sources have target share 1/40 = half their actual 1/20
    # -> roughly halved (md5-uniform, so allow slack on small strata)
    light = sum(per[f"src{i}"] for i in range(10))
    light_orig = sum(n_src[f"src{i}"] for i in range(10))
    assert 0.3 * light_orig <= light <= 0.7 * light_orig
    ids_a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    ids_b = sorted(
        r.doc_id
        for r in resample_to_mix(doc, "source", "doc_id", mix).select("doc_id").collect()
    )
    assert ids_a == ids_b


def test_bpe_roundtrip_and_determinism(spark, sf_dir):
    """BPE: (1) training is bit-deterministic, (2) tokens reconstruct the
    normalized text exactly, (3) merges actually compress vs characters."""
    from pyspark.sql import functions as F

    from sdc_spark.operators import bpe
    from sdc_spark.operators.dedup import normalized_text
    from sdc_spark.sources.readers import read_table

    doc = read_table(spark, sf_dir, "documents")
    m1 = bpe.train_bpe(doc, "text", num_merges=150, max_words=10000)
    m2 = bpe.train_bpe(doc, "text", num_merges=150, max_words=10000)
    assert m1 == m2 and len(m1) > 0

    tok = bpe.bpe_tokenize(doc, "text", "doc_id", m1)
    joined = tok.select(
        "doc_id",
        "n_tokens",
        F.regexp_replace(F.concat_ws("", "tokens"), "</w>", " ").alias("rejoined"),
    )
    ref = doc.select(
        "doc_id", F.concat(normalized_text(F.col("text")), F.lit(" ")).alias("norm")
    )
    bad = joined.join(ref, "doc_id").filter(
        F.col("rejoined") != F.col("norm")
    ).count()
    assert bad == 0, f"{bad} documents failed BPE round-trip"

    # merges compress: strictly fewer tokens than characters for real docs
    worse = joined.join(ref, "doc_id").filter(
        (F.col("n_tokens") >= F.length("norm")) & (F.length("norm") > 20)
    ).count()
    assert worse == 0
