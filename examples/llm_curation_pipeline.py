"""End-to-end training-data curation on the operator layer — the pipeline
a 100-TB corpus actually runs, demonstrated on the bundled test tables:

1. exact dedup (hash-groupBy)            operators/dedup.exact_dedup
2. near-dup pairs (MinHash 128 + LSH)    operators/dedup.minhash_lsh_pairs
3. dup clusters (connected components)   operators/dedup.dedup_components
4. leakage-safe split (clusters as units) plans spelling, md5 buckets
5. sequence packing (2048-token windows) operators/curation.pack_sequences

Every step is a DataFrame composition (no driver-side loops over rows);
the same code scales by partitioning, not rewriting.

Run:  python examples/llm_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sdc_spark.operators import curation, dedup
from sdc_spark.session import get_spark
from sdc_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_llm_curation")
    docs = read_table(spark, sf_dir, "documents")

    uniq = dedup.exact_dedup(docs, "text", "doc_id")
    print("exact-distinct docs:", uniq.count(), "of", docs.count())

    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.8)
    comps = dedup.dedup_components(pairs)
    print("near-dup pairs:", pairs.count(), "clusters:",
          comps.select("component").distinct().count())

    # chunk-level dedup: content-defined boundaries re-synchronize after
    # edits, so shared passages surface even when whole docs differ
    chunks = dedup.content_defined_chunks(docs, "text", "doc_id")
    cross = (
        chunks.groupBy("chunk_hash")
        .agg(F.count_distinct("doc").alias("n_docs"))
        .filter("n_docs >= 2")
    )
    print("chunks:", chunks.count(), "duplicated across docs:", cross.count())

    toks = docs.select(
        "doc_id",
        F.size(F.split(dedup.normalized_text(F.col("text")), " ")).alias("n_tok"),
    )
    packed = curation.pack_sequences(toks, "doc_id", "n_tok", budget=2048)
    print("packs:", packed.agg(F.max("pack_id") + 1).collect()[0][0],
          "boundary-spanning docs:",
          packed.filter("spans_boundary").count())


if __name__ == "__main__":
    main()
