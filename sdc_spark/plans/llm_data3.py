"""Round-4 LLM-data additions: corpus rewrite at passage granularity.

`passage_dedup` (llm_data2.py) audits cross-document duplication;
this module goes one step further and REWRITES the corpus the way a
C4/CCNet-style pipeline does: every 16-token passage is kept only at its
globally-first occurrence (ordered by (doc_id, passage_no)) and each
document is reconstructed from its surviving passages, preserving order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdc_spark.operators.dedup import normalized_text
from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import read_table

_P = 16  # tokens per passage (same granularity as passage_dedup)


@query("passage_dedup_rewrite")
def passage_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop every repeated passage at any occurrence after its first and
    rebuild each document's text from the survivors.

    Scale shape: the first-occurrence decision shuffles only
    (16-byte hash, 8-byte packed position) pairs — never text; the rebuild
    shuffles each KEPT passage's text exactly once (linear, and the output
    IS text so that traffic is irreducible). The per-doc reassembly is a
    hash aggregation with collect_list + array_sort — bounded by document
    size, not corpus size. A doc whose every passage already appeared
    earlier survives with an empty rebuilt text (md5 of '')."""
    doc = read_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.split(normalized_text(F.col("text")), " ").alias("toks")
    )
    n_pass = F.ceil(F.size("toks") / F.lit(float(_P))).cast("int")
    passages = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i * _P + 1, _P)),
            )
        ).alias("pidx", "ptext"),
    )
    # packed scalar order key: pidx < 4096 always (range cap), so
    # doc_id * 10_000 + pidx is collision-free and fits a long
    pkey = (F.col("doc_id") * 10_000 + F.col("pidx")).alias("pkey")
    keyed = passages.select(
        "doc_id", "pidx", "ptext", pkey, F.md5(F.col("ptext").cast("binary")).alias("phash")
    )
    firsts = keyed.groupBy("phash").agg(F.min("pkey").alias("first_pkey"))
    kept = keyed.join(firsts, "phash").filter(F.col("pkey") == F.col("first_pkey"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pidx", "ptext"))),
                    lambda s: s.ptext,
                ),
            ).cast("binary")
        ).alias("rebuilt_md5"),
    )
    totals = passages.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_passages"))
    empty_md5 = F.md5(F.lit("").cast("binary"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("rebuilt_md5", empty_md5).alias("rebuilt_md5"),
        )
        .orderBy("doc_id")
    )


oracle(
    "passage_dedup_rewrite",
    r"""
    WITH toks AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                            ' ') AS arr
        FROM documents
    ), passages AS (
        SELECT doc_id, i,
               array_to_string(list_slice(arr, i * 16 + 1, i * 16 + 16),
                               ' ') AS ptext
        FROM toks CROSS JOIN range(0, 4096) t(i)
        WHERE i < ceil(len(arr) / 16.0)
    ), keyed AS (
        SELECT doc_id, i, ptext, doc_id * 10000 + i AS pkey,
               md5(ptext) AS phash
        FROM passages
    ), firsts AS (
        SELECT phash, min(pkey) AS first_pkey FROM keyed GROUP BY phash
    ), kept AS (
        SELECT k.* FROM keyed k JOIN firsts f
        ON k.phash = f.phash AND k.pkey = f.first_pkey
    ), rebuilt AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(ptext, ' ' ORDER BY i)) AS rebuilt_md5
        FROM kept GROUP BY doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_passages FROM passages GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_passages,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.rebuilt_md5, md5('')) AS rebuilt_md5
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
