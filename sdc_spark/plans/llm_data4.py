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
    Rank·x sums stay in long arithmetic until the final division —
    headroom to ~10^18 (e.g. 10^7 docs × 10^6-token ranks per source);
    beyond that switch the product to decimal(38,0) or double (the Gini
    is a ratio, double keeps 15 significant digits)."""
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
    SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok,
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


@query("ann_eval_metrics")
def ann_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness: exact cosine top-10 for 20
    query vectors, scored against label relevance (a neighbor is relevant
    iff it shares the query's label) as precision@10 / recall@10 / MRR /
    NDCG@10 per query — the metrics an ANN index (LSH/IVF/PQ) is tuned
    against.

    Scale shape: the retrieval reuses ann_bruteforce_topk's broadcast-
    queries/one-corpus-scan plan; the metric pass works on q×k rows
    (tiny) plus one label-count aggregate broadcast for the recall
    denominator. IDCG's variable depth is a row-local `sequence`
    aggregate, not a join."""
    from sdc_spark.operators.similarity import ann_bruteforce_topk

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    topk = ann_bruteforce_topk(emb, q, k=10)
    lab = emb.select("vec_id", "label")
    label_sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    t = (
        topk.join(
            F.broadcast(
                lab.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlab"))
            ),
            "qid",
        )
        .join(
            F.broadcast(
                lab.select(F.col("vec_id").alias("nid"), F.col("label").alias("nlab"))
            ),
            "nid",
        )
        .withColumn("rel", (F.col("qlab") == F.col("nlab")).cast("int"))
    )
    per_q = t.groupBy("qid", "qlab").agg(
        F.sum("rel").alias("n_rel_ret"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
    )
    scored = per_q.join(
        F.broadcast(label_sizes.withColumnRenamed("label", "qlab")), "qlab"
    ).withColumn("n_rel_total", F.least(F.col("n_label") - 1, F.lit(1_000_000)))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(10), F.col("n_rel_total"))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    return scored.select(
        "qid",
        F.col("n_rel_ret").cast("int").alias("n_rel_ret"),
        F.round(F.col("n_rel_ret") / 10.0, 4).alias("precision10"),
        F.round(F.try_divide(F.col("n_rel_ret"), F.col("n_rel_total")), 4).alias(
            "recall10"
        ),
        F.round("mrr", 4).alias("mrr"),
        F.round(F.try_divide(F.col("dcg"), idcg), 4).alias("ndcg10"),
    )


oracle(
    "ann_eval_metrics",
    """
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlab
        FROM embeddings WHERE vec_id < 20
    ), scored AS (
        SELECT qid, qlab, v.vec_id AS nid, v.label AS nlab,
               sum(CAST(qv[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))
                   / (sqrt(sum(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
                      * sqrt(sum(CAST(v.embedding[i] AS DOUBLE)
                                 * CAST(v.embedding[i] AS DOUBLE)))) AS c
        FROM q JOIN embeddings v ON v.vec_id <> qid,
             UNNEST(generate_series(1, len(qv))) AS s(i)
        GROUP BY qid, qlab, nid, nlab
    ), ranked AS (
        SELECT qid, qlab, nlab,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rank
        FROM scored
    ), top AS (
        SELECT qid, qlab, rank, CASE WHEN nlab = qlab THEN 1 ELSE 0 END AS rel
        FROM ranked WHERE rank <= 10
    ), sizes AS (
        SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1
    ), per_q AS (
        SELECT t.qid, t.qlab,
               sum(rel) AS n_rel_ret,
               coalesce(1.0 / min(CASE WHEN rel = 1 THEN rank END), 0.0) AS mrr,
               sum(rel / log2(rank + 1)) AS dcg
        FROM top t GROUP BY 1, 2
    )
    SELECT p.qid,
           CAST(p.n_rel_ret AS INT) AS n_rel_ret,
           round(p.n_rel_ret / 10.0, 4) AS precision10,
           round(CAST(p.n_rel_ret AS DOUBLE) / (s.n_label - 1), 4) AS recall10,
           round(p.mrr, 4) AS mrr,
           round(p.dcg / list_sum(list_transform(
                     generate_series(1, least(10, s.n_label - 1)),
                     i -> 1.0 / log2(i + 1))),
                 4) AS ndcg10
    FROM per_q p JOIN sizes s ON s.label = p.qlab
    """,
)
