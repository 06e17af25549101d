"""Streaming dedup + stream-stream joins — the streaming halves of the
LLM-data pipeline (batch twins live in operators/dedup.py and plans/joins).

The reference is batch-only (SURVEY §2.6 'streaming: absent'); these are
Spark-native extensions:

- streaming exact dedup: dropDuplicatesWithinWatermark on a content hash —
  state holds one 16-byte hash + timestamp per doc inside the watermark
  horizon, so state size is bounded by (ingest rate × watermark), not by
  corpus size. That is the only formulation that survives an unbounded
  100 TB/day stream; plain dropDuplicates would accrete state forever.
- stream-stream interval join: orders-stream enriched with lineitems that
  ship within a bounded horizon — watermarks on BOTH sides plus a time-range
  predicate let Spark evict join state; without the range bound the join
  state is unbounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sdc_spark.operators.dedup import normalized_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Exact dedup over an unbounded document stream: first occurrence of
    each normalized-content hash within the watermark horizon survives.

    Duplicates arriving later than the watermark are not caught (their
    state was evicted) — the standard correctness/state tradeoff; batch
    exact_dedup is the closed-world twin."""
    from sdc_spark.streaming.windows import _with_event_time

    hashed = _with_event_time(stream, ts_col).withColumn(
        "content_hash", F.md5(normalized_text(text_col).cast("binary"))
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("content_hash", ts_col, *payload)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join on an equi key with a bounded event-time
    range: right rows match only within [left_ts, left_ts + horizon]. The
    watermarks + range predicate bound both sides' join state."""
    from sdc_spark.streaming.windows import _with_event_time

    l_ = _with_event_time(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r_ = _with_event_time(right, right_ts).withWatermark(right_ts, watermark).alias("r")
    return l_.join(
        r_,
        F.expr(
            f"l.{on} = r.{on} AND r.{right_ts} >= l.{left_ts} "
            f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {horizon}"
        ),
    )


def streaming_near_dedup_against_index(
    stream: DataFrame,
    index_buckets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    ngram: int = 3,
) -> DataFrame:
    """Streaming near-duplicate screening against a STATIC MinHash/LSH
    index (the 'is this incoming doc a near-dup of the existing corpus?'
    gate every continuously-ingesting training pipeline needs).

    ``index_buckets`` is the batch-built (band, bhash, doc) table from
    ``sdc_spark.operators.dedup.lsh_band_table``. Each arriving doc
    computes its signature row-locally (pure array expressions — no state,
    no shuffle of the stream), derives its band hashes, and stream-static
    inner-joins the bucket table. Stream-static joins are stateless on the
    stream side; the static side is just a (re-broadcastable) DataFrame,
    so the operator's memory is O(index), not O(stream).

    Emits (id, band, cand_doc) candidate rows; exact verification joins
    the candidate's shingle sets batch-side downstream (candidates are a
    trickle, not a corpus)."""
    from sdc_spark.operators.dedup import minhash_signature, ngrams_of_tokens

    rows = num_hashes // bands
    toks = stream.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("__toks__"),
    )
    grams = toks.select(
        id_col, ngrams_of_tokens(F.col("__toks__"), ngram).alias("__grams__")
    )
    sig = grams.select(
        F.col(id_col), minhash_signature(F.col("__grams__"), num_hashes).alias("sig")
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows + j + 1) for j in range(rows)],
                            F.lit(b),
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.bhash")
    return banded.join(
        index_buckets, on=["band", "bhash"], how="inner"
    ).select(F.col(id_col).alias("incoming_id"), "band", F.col("doc").alias("cand_doc"))


def streaming_substring_screen(
    stream: DataFrame,
    gram_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
) -> DataFrame:
    """Streaming ExactSubstr gate against a STATIC persisted gram-hash
    set (sdc_spark.operators.dedup.write_substring_index → spark.table):
    every arriving document's char positions are exploded and k-gram-
    hashed row-locally (narrow, stateless — no shuffle of the stream),
    then stream-static LEFT SEMI joined to the 8-byte hash set. Emits
    (incoming_id, pos) for every position whose ≥ ``min_len``-char
    window already exists in the corpus — the same marks the batch
    screen derives from the index half.

    Scope, stated honestly: this is the per-document corpus gate.
    Duplication BETWEEN documents of the same in-flight batch (content
    absent from the corpus but repeated among new arrivals) is invisible
    to a stateless screen by construction — it surfaces at the next
    index append, exactly like the LSH streaming screen above. Span
    merging is a windowed aggregation (unsupported on unbounded
    streams): run operators.dedup._merge_marked_positions over each
    micro-batch's marks in foreachBatch, or downstream in batch."""
    k = int(min_len)
    pos = stream.filter(F.length(text_col) >= k).select(
        F.col(id_col),
        F.col(text_col).alias("__t__"),
        F.explode(F.sequence(F.lit(1), F.length(text_col) - k + 1)).alias("pos"),
    )
    hashed = pos.select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"xxhash64(substring(__t__, pos, {k}))").alias("h"),
    )
    return hashed.join(gram_index.select("h"), "h", "left_semi").select(
        F.col(id_col).alias("incoming_id"), "pos"
    )


def streaming_bm25_candidates(
    query_stream: DataFrame,
    postings: DataFrame,
    qid_col: str = "qid",
    term_col: str = "term",
) -> DataFrame:
    """Streaming lexical serving against the STATIC posting index (the
    query-stream half of the persisted BM25 index — same one-index-two-
    halves pattern as the LSH and substring gates): arriving (qid, term)
    rows stream-static inner-join the bucketed posting table. Stateless
    on the stream side, O(index) memory; emits the matched candidate
    postings (qid, doc, token, tf, dl). Scoring + top-k complete per
    micro-batch in foreachBatch via
    operators.retrieval.score_matched_postings — the SAME scorer the
    batch server uses, so the halves cannot drift (global aggregation on
    an unbounded stream is unsupported without a watermark; per-batch
    completion is the documented pattern, like the substring gate's span
    merge)."""
    q = query_stream.select(
        F.col(qid_col).alias("qid"), F.col(term_col).alias("token")
    )
    return q.join(postings, "token").select("qid", "doc", "token", "tf", "dl")
