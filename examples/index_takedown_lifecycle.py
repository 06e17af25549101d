"""Takedown/compliance lifecycle across every persisted index — the
operational loop a long-lived 100-TB corpus runs when removal requests
arrive (DMCA, GDPR erasure, contaminated-source expiry):

1. build the four index families over the corpus once per snapshot
   (posting lists for BM25 serving, LSH bands/grams for near-dedup
   screening, IVF cells for ANN, substring gram counts for ExactSubstr);
2. on each takedown batch, call ``takedown_documents`` ONCE — every
   family logs an O(|batch|)-write tombstone (the multi-TB index files
   are untouched) and every serve path excludes the docs immediately;
3. on the maintenance schedule (weekly, with compactions), call
   ``compact_indexes`` — tombstones are applied physically, stats
   re-based, logs cleared.

The write-amplification contract is the point: a takedown costs
kilobytes at request time, and the full-index rewrite happens exactly
once per compaction cycle no matter how many requests arrived.

Run:  python examples/index_takedown_lifecycle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import sdc_spark.operators.dedup as sdedup
import sdc_spark.operators.retrieval as sret
import sdc_spark.operators.similarity as ssim
from sdc_spark.operators.maintenance import compact_indexes, takedown_documents
from sdc_spark.session import get_spark
from sdc_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("index_takedown_lifecycle")
    root = tempfile.mkdtemp(prefix="sdc_takedown_demo_")
    doc = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings")
    name = "demo"

    # 1. snapshot build
    sret.write_posting_index(spark, doc, "text", "doc_id", name,
                             path_root=f"{root}/post")
    sdedup.write_lsh_index(spark, doc, "text", "doc_id", name,
                           path_root=f"{root}/lsh")
    sdedup.write_substring_index(spark, doc, "text", "doc_id", name,
                                 min_len=20, path_root=f"{root}/sub")
    cent_p, cells_p = ssim.write_ivf_index(spark, emb, name=name,
                                           path_root=f"{root}/ivf")
    indexes = [
        {"kind": "posting", "name": name, "path_root": f"{root}/post"},
        {"kind": "lsh", "name": name, "path_root": f"{root}/lsh"},
        {"kind": "substring", "name": name, "path_root": f"{root}/sub",
         "min_len": 20},
        {"kind": "ivf", "name": name, "path_root": f"{root}/ivf"},
    ]

    q = spark.createDataFrame([(0, "vector"), (0, "hash")], "qid int, term string")
    before = sret.bm25_from_index(spark, name, q).count()

    # 2. a removal request arrives: every 4th doc
    removed = doc.filter(F.col("doc_id") % 4 == 0)
    takedown_documents(spark, removed, indexes)
    after = sret.bm25_from_index(spark, name, q).count()
    print(f"BM25 hit rows: {before} -> {after} (tombstoned, no rewrite)")

    # 3. scheduled maintenance applies the logs physically
    compact_indexes(spark, indexes)
    print("compacted:", sret.bm25_from_index(spark, name, q).count(),
          "hit rows (identical service, logs cleared)")

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
