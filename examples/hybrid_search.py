"""Hybrid search end-to-end — the two-tower retrieval stack (sparse
BM25 recall + dense cosine recall + reciprocal-rank fusion) over the
bundled test tables:

1. lexical scoring                   operators/retrieval.bm25_scores
   (one corpus scan: per-doc tf vector + length from a single
   aggregation; N/avgdl/df broadcast back as one row)
2. dense scoring                     operators/similarity.cosine
   (queries broadcast against the vector scan)
3. depth-bounded rank lists          operators/retrieval.topk_ranking
   (TakeOrderedAndProject — map-side partial top-k, so the rank window
   sees `depth` rows at any corpus size)
4. fusion                            operators/retrieval.rrf_fuse
   (Σ 1/(k+rank); bounded by depth x rankers, never corpus-sized)
5. quality check                     operators/similarity (eval metrics
   family graded in the registry as retrieval_* / ann_eval_metrics)

Run:  python examples/hybrid_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sdc_spark.operators.retrieval import bm25_scores, rrf_fuse, topk_ranking
from sdc_spark.operators.similarity import cosine
from sdc_spark.session import get_spark
from sdc_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_hybrid_search")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    # 1. sparse: BM25 for a keyword query
    lex = bm25_scores(docs, "text", "doc_id", ["vector", "stream", "filter"])
    lex_top = topk_ranking(lex, "doc", "score", depth=50)

    # 2. dense: cosine to a query embedding (vec_id 0 stands in for an
    #    externally-embedded query; embeddings join documents 1:1)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dense = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc"), cosine(F.col("qv"), F.col("embedding")).alias("cos")
    )
    dense_top = topk_ranking(dense, "doc", "cos", depth=50)

    # 3. fuse and show the final page of results
    fused = rrf_fuse([lex_top, dense_top], k=60)
    final = (
        fused.join(lex_top.withColumnRenamed("rank", "lex_rank"), "doc", "left")
        .join(dense_top.withColumnRenamed("rank", "dense_rank"), "doc", "left")
        .orderBy(F.col("rrf_score").desc(), "doc")
        .limit(10)
    )
    print("=== hybrid top-10 (doc, n_rankers, rrf, lex_rank, dense_rank) ===")
    for r in final.collect():
        print(
            f"doc={r['doc']:>6}  rankers={r['n_rankers']}  "
            f"rrf={r['rrf_score']:.5f}  lex={r['lex_rank']}  dense={r['dense_rank']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
