"""Event-time windowed aggregation: tumbling / sliding / session, with
watermarks for late data.

Streaming entry points take a streaming DataFrame (spark.readStream…);
the *_batch twins compute identical results on a batch frame — used by the
correctness oracle and as the semantic spec.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.materialize import materialize as _materialize

DEFAULT_AGGS: tuple[tuple[str, str], ...] = (("count", "*"), ("sum", "value"))


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet sources may carry
    TIMESTAMP_NTZ. The session runs UTC, so the cast is value-preserving."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def _agg_exprs(aggs: Sequence[tuple[str, str]]) -> list[Column]:
    out = []
    for kind, col in aggs:
        if kind == "count":
            out.append(F.count(F.lit(1)).alias("n_events"))
        elif kind == "sum":
            out.append(F.round(F.sum(col), 4).alias(f"sum_{col}"))
        elif kind == "avg":
            out.append(F.round(F.avg(col), 4).alias(f"avg_{col}"))
        else:
            raise ValueError(f"unsupported agg {kind!r}")
    return out


def tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    aggs: Sequence[tuple[str, str]] = DEFAULT_AGGS,
) -> DataFrame:
    """Tumbling event-time windows with a late-data watermark. In streaming
    mode the watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted."""
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *keys,
            *[c for c in ["n_events", "sum_value", "avg_value"]][: len(aggs)],
        )
    )


def sliding_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    aggs: Sequence[tuple[str, str]] = DEFAULT_AGGS,
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in window/slide panes."""
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), *keys)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *keys,
            *[c for c in ["n_events", "sum_value", "avg_value"]][: len(aggs)],
        )
    )


def session_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) in streaming mode via F.session_window."""
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *keys,
            "n_events", "sum_value",
        )
    )


def tumbling_agg_batch(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "5 minutes",
    aggs: Sequence[tuple[str, str]] = DEFAULT_AGGS,
) -> DataFrame:
    """Batch twin of tumbling_agg (F.window works on batch frames too)."""
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *keys,
            *[c for c in ["n_events", "sum_value", "avg_value"]][: len(aggs)],
        )
    )


def session_agg_batch(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: lag-gap flag → cumulative session id → per-
    session aggregate. Semantically identical to session_window on a
    closed batch (every session's gap has elapsed)."""
    w = W.partitionBy(key).orderBy(ts_col, "event_id")
    # gap compared in exact integer microseconds (unix_timestamp truncates
    # to seconds, which shifts events near the gap boundary); cast to
    # TIMESTAMP so TIMESTAMP_NTZ columns work too (unix_micros rejects NTZ;
    # the session runs UTC so the cast is value-preserving, and the fixed
    # offset cancels in the difference regardless)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts_col, 1).over(w)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    flagged = df.withColumn(
        "new_sess",
        F.when(prev.isNull(), 1)
        .when((us(F.col(ts_col)) - us(prev)) > gap_us, 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sessions.groupBy(key, "sess_id").agg(
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def sliding_agg_batch(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "10 minutes",
    slide: str = "5 minutes",
    aggs: Sequence[tuple[str, str]] = DEFAULT_AGGS,
) -> DataFrame:
    """Batch twin of sliding_agg (F.window with a slide works on batch
    frames too — each event expands to window/slide panes)."""
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("win"), *keys)
        .agg(*_agg_exprs(aggs))
        .select(
            F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *keys,
            *[c for c in ["n_events", "sum_value", "avg_value"]][: len(aggs)],
        )
    )


def trending_topk_stream(
    stream: DataFrame,
    sink_table: str,
    k: int = 3,
    window: str = "6 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Streaming trending top-k via foreachBatch: windowed counts stream
    in update mode; each micro-batch's emitted (window, key, count) deltas
    are merged into an in-memory result table and re-ranked per window.

    foreachBatch is the standard escape hatch when the per-window RANK
    (not expressible in a streaming aggregation) must stay fresh: the
    expensive part — the windowed count — is incremental streaming state;
    only the tiny aggregated delta is re-ranked per batch. Returns the
    started query; read results from ``sink_table`` (global temp-ish
    session view maintained by the batch function)."""
    from pyspark.sql import Window as W

    counts = (
        _with_event_time(stream, ts_col)
        .withWatermark(ts_col, "1 day")
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("win_start"), key_col, "n"
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # The sink keeps FULL merged counts (not just the current top-k):
        # a key outside today's top-k can enter it in a later batch, so
        # truncating state here would corrupt future rankings. Ranking is
        # a cheap read-time view over the (windows x keys)-sized table.
        # foreachBatch runs on a CLONED SparkSession: plain temp views
        # registered here are invisible to the driver session, so the
        # sink lives in the global_temp database.
        spark = batch_df.sparkSession
        cur = (
            spark.table("global_temp." + sink_table + "_counts")
            if spark.catalog.tableExists("global_temp." + sink_table + "_counts")
            else None
        )
        if cur is not None:
            # update-mode deltas supersede previous rows for their
            # (window, key); keep other keys' standing counts
            keep = cur.join(
                batch_df.select("win_start", key_col),
                ["win_start", key_col],
                "left_anti",
            )
            merged = keep.unionByName(batch_df.select(cur.columns))
        else:
            merged = batch_df
        merged = merged.transform(_materialize)
        merged.createOrReplaceGlobalTempView(sink_table + "_counts")
        wr = W.partitionBy("win_start").orderBy(F.desc("n"), key_col)
        merged.withColumn("rk", F.row_number().over(wr)).filter(
            F.col("rk") <= k
        ).createOrReplaceGlobalTempView(sink_table)

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
