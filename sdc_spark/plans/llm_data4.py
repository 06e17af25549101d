"""Round-4 LLM-pipeline additions: RAG chunking, per-source duplication
rate, and per-source token-count Gini concentration.

All three are DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.operators.dedup import normalized_text
from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import read_table

_CHUNK = 64  # tokens per retrieval chunk
_STRIDE = 48  # chunk start stride (CHUNK - STRIDE = 16 tokens of overlap)


@query("rag_chunk_overlap")
def rag_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for retrieval indexing: every
    document is cut into 64-token chunks starting every 48 tokens (16-token
    overlap so no boundary sentence is lost), each chunk fingerprinted.

    Scale shape: zero shuffle — tokenize, sequence the chunk starts, and
    posexplode all happen inside one narrow stage; output rows ≈
    corpus_tokens / 48. The token array is materialized in its own
    projection ONCE per doc (the inline form would re-run the regex
    pipeline per chunk)."""
    doc = read_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.split(normalized_text(F.col("text")), " ").alias("toks")
    )
    n = F.size("toks")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(_STRIDE))
    chunks = toks.select(
        "doc_id",
        "toks",
        n.alias("n_tok_doc"),
        F.posexplode(starts).alias("chunk_no", "start_tok"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok"), _CHUNK)
    return chunks.select(
        "doc_id",
        "chunk_no",
        "start_tok",
        F.least(F.lit(_CHUNK), F.col("n_tok_doc") - F.col("start_tok") + 1).alias(
            "n_tok"
        ),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
    )


oracle(
    "rag_chunk_overlap",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents
    )
    , s AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t), 1), 48)) AS s
        FROM t
    )
    SELECT doc_id,
           CAST((s - 1) / 48 AS INT) AS chunk_no,
           CAST(s AS INT) AS start_tok,
           CAST(least(64, len(t) - s + 1) AS INT) AS n_tok,
           md5(array_to_string(list_slice(t, s, least(s + 63, len(t))), ' '))
             AS chunk_md5
    FROM s
    """,
)


@query("dup_rate_by_source")
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication diagnostics — the first report a
    curation run produces: how much of each source is redundant before any
    near-dup pass. Shuffles only (16-byte hash, source) pairs."""
    doc = read_table(spark, sf_dir, "documents")
    h = F.md5(normalized_text(F.col("text")).cast("binary")).alias("content_hash")
    return (
        doc.select("source", h)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("content_hash").alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.countDistinct("content_hash") / F.count(F.lit(1)), 4
            ).alias("dup_rate"),
        )
    )


oracle(
    "dup_rate_by_source",
    r"""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
             AS n_distinct,
           round(1.0 - count(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
                         / count(*), 4) AS dup_rate
    FROM documents GROUP BY 1
    """,
)


@query("tokens_gini_by_source")
def tokens_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count inequality (Gini) within each source — a mixing
    diagnostic: a source whose token mass concentrates in a few huge docs
    behaves very differently under doc-level sampling than its doc count
    suggests. Gini = (2·Σ rank·x) / (n·Σx) − (n+1)/n over ascending token
    counts (rank ties carry equal x, so the sum is order-invariant).

    Scale shape: one shuffle on source for the rank window, one aggregate.
    Rank·x sums stay in long arithmetic until the final division."""
    doc = read_table(spark, sf_dir, "documents")
    toks = doc.select(
        "source",
        F.size(F.split(normalized_text(F.col("text")), " ")).alias("n_tok"),
    )
    ranked = toks.withColumn(
        "rk", F.row_number().over(W.partitionBy("source").orderBy("n_tok"))
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tok"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("rk").cast("long") * F.col("n_tok")))
            / (F.count(F.lit(1)) * F.sum("n_tok"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
    )


oracle(
    "tokens_gini_by_source",
    r"""
    WITH t AS (
        SELECT source,
               len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
                 AS n_tok
        FROM documents
    ), r AS (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY source ORDER BY n_tok) AS rk
        FROM t
    )
    SELECT source, count(*) AS n_docs, sum(n_tok) AS total_tok,
           round(2.0 * sum(rk * n_tok) / (count(*) * sum(n_tok))
                 - (count(*) + 1.0) / count(*), 4) AS gini
    FROM r GROUP BY 1
    """,
)


@query("sample_negatives")
def sample_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling (operators/curation.py
    sample_negatives): every 50th doc is an anchor; it gets the 4
    out-of-source docs ranking first by md5(anchor||cand) inside its md5
    hash bucket. Bucketed join — per-anchor candidate fan-out is
    n/n_buckets, never all-pairs."""
    from sdc_spark.operators import curation

    doc = read_table(spark, sf_dir, "documents")
    return curation.sample_negatives(
        doc, "doc_id", "source", k=4, n_buckets=32, anchor_every=50
    )


oracle(
    "sample_negatives",
    """
    WITH b AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 32
                 AS bk
        FROM documents
    ), paired AS (
        SELECT a.doc_id AS anchor_id, c.doc_id AS cand_id,
               row_number() OVER (
                   PARTITION BY a.doc_id
                   ORDER BY md5(CAST(a.doc_id AS VARCHAR) || '|'
                                || CAST(c.doc_id AS VARCHAR)), c.doc_id
               ) AS neg_rank
        FROM b a JOIN b c ON a.bk = c.bk
        WHERE a.doc_id % 50 = 0 AND c.source <> a.source
          AND c.doc_id <> a.doc_id
    )
    SELECT anchor_id, cand_id, neg_rank FROM paired WHERE neg_rank <= 4
    """,
)
