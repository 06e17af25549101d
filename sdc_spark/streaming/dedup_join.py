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
