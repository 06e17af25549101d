"""Streaming-semantics coverage queries (batch twins, DuckDB-oracled).

The streaming execution of the same expressions is exercised in
tests/test_streaming.py (memory sink + processAllAvailable); here the
batch twins pin the window/session semantics against SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import local_rows, read_table
from sdc_spark.streaming.windows import session_agg_batch, tumbling_agg_batch


@query("window_tumbling_agg")
def window_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling event-time windows per event_type (streaming twin:
    sdc_spark.streaming.windows.tumbling_agg)."""
    ev = read_table(spark, sf_dir, "events")
    out = tumbling_agg_batch(ev, window="5 minutes")
    return out.select(
        F.col("win_start").cast("string").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


oracle(
    "window_tumbling_agg",
    """
    SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS win_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


@query("window_session_agg")
def window_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session) —
    batch twin of F.session_window, built from lag + running sum."""
    ev = read_table(spark, sf_dir, "events")
    out = session_agg_batch(ev, gap_minutes=30)
    # session bounds as exact epoch-microsecond longs (timestamp string
    # formatting differs across engines on trailing fractional zeros)
    return out.select(
        "user_id",
        "sess_id",
        F.unix_micros(F.col("sess_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("sess_end").cast("timestamp")).alias("end_us"),
        "n_events",
        "sum_value",
    )


oracle(
    "window_session_agg",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000 THEN 1
                    ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM flagged
    )
    SELECT user_id, sess_id,
           epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
           epoch_us(CAST(max(ts) AS TIMESTAMP)) AS end_us,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess GROUP BY 1, 2
    """,
)


@query("window_sliding_agg")
def window_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2 panes
    (streaming twin: sdc_spark.streaming.windows.sliding_agg)."""
    from sdc_spark.streaming.windows import sliding_agg_batch

    ev = read_table(spark, sf_dir, "events")
    out = sliding_agg_batch(ev, window="10 minutes", slide="5 minutes")
    return out.select(
        F.col("win_start").cast("string").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


oracle(
    "window_sliding_agg",
    """
    WITH panes AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS s, event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
               event_type, value
        FROM events
    )
    SELECT CAST(s AS VARCHAR) AS win_start, event_type,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM panes GROUP BY 1, 2
    """,
)


@query("stream_anomaly_zscore")
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running z-score anomaly detection, batch twin of the stateful
    streaming operator (streaming/stateful.py:anomaly_zscore — Welford
    state, O(keys) memory). Each event scored against the user's PRIOR
    events only; one shuffle on user_id."""
    from sdc_spark.streaming.stateful import anomaly_zscore_batch

    ev = read_table(spark, sf_dir, "events")
    out = anomaly_zscore_batch(ev, z_threshold=2.5, min_prior=5)
    return out.select(
        "user_id",
        "event_id",
        "n_prior",
        F.round("zscore", 4).alias("zscore"),
        "is_anomaly",
    )


oracle(
    "stream_anomaly_zscore",
    """
    WITH w AS (
        SELECT user_id, event_id,
               count(value) OVER pw AS n_prior,
               avg(value) OVER pw AS pmean,
               stddev_samp(value) OVER pw AS pstd,
               value
        FROM events
        WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, n_prior,
           round(CASE WHEN n_prior >= 5 AND pstd > 0.0
                      THEN (value - pmean) / pstd END, 4) AS zscore,
           coalesce(CASE WHEN n_prior >= 5 AND pstd > 0.0
                         THEN abs((value - pmean) / pstd) > 2.5 END,
                    FALSE) AS is_anomaly
    FROM w
    """,
)


@query("streaming_bm25_gate_e2e")
def streaming_bm25_gate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming serve, graded through the driver oracle (the
    other streaming registry queries are batch twins; this one RUNS a
    Structured Streaming job): the (qid, term) query workload arrives as
    a FILE STREAM, stream-static joins the persisted bucketed posting
    index (streaming/dedup_join.streaming_bm25_candidates), and each
    micro-batch completes scoring + top-5 in foreachBatch via the SAME
    score_matched_postings the batch server uses. Driven by
    trigger(availableNow) to a deterministic end; the oracle recomputes
    batch BM25 from raw text in DuckDB, so a drift between the streaming
    and batch halves — or a stale posting — is a value mismatch.

    Scale shape: identical to bm25_from_index — the corpus tokenizes
    once at index-build time, query terms stream onto the bucketed
    posting table (stream-static joins are stateless on the stream
    side), df aggregates over matched postings only. The one-file query
    drop makes availableNow a single micro-batch; a production feed
    would trickle many, each completing independently."""
    import shutil
    import tempfile

    import sdc_spark.operators.retrieval as sret
    from sdc_spark.plans.retrieval_q import _BATCH_QUERIES, _sf_tag
    from sdc_spark.streaming.dedup_join import streaming_bm25_candidates

    doc = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    name = f"lexgate_{_sf_tag(sf_dir)}"
    sret.drop_posting_index(spark, name)
    sret.write_posting_index(spark, doc, "text", "doc_id", name)

    work = tempfile.mkdtemp(prefix="sdc_bm25_gate_")
    try:
        qdf = local_rows(spark, _BATCH_QUERIES, "qid int, term string")
        qdf.coalesce(1).write.mode("overwrite").parquet(f"{work}/queries")
        qstream = spark.readStream.schema("qid int, term string").parquet(
            f"{work}/queries"
        )
        cands = streaming_bm25_candidates(
            qstream, spark.table(f"postings_{name}")
        )
        stats = spark.table(f"lexstats_{name}").agg(
            F.sum("n_docs").alias("n_docs"),
            (
                F.sum("sum_dl").cast("double") / F.sum("n_docs").cast("double")
            ).alias("avgdl"),
        )
        collected: list = []

        def complete(batch_df, _bid):
            from pyspark.sql.window import Window as W

            scored = sret.score_matched_postings(batch_df, stats)
            # depth-bound INSIDE the micro-batch (rank window over the
            # per-qid scored set, top-5 kept) so what crosses to the
            # driver is O(queries x depth), never O(matched corpus)
            w = W.partitionBy("qid").orderBy(
                F.col("score").desc(), F.col("doc")
            )
            top = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .drop("rank")
            )
            collected.extend(top.collect())

        sq = (
            cands.writeStream.foreachBatch(complete)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{work}/ck")
            .start()
        )
        sq.awaitTermination()
        out = local_rows(
            spark, collected, "qid int, doc long, n_hit_terms bigint, score double"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        sret.drop_posting_index(spark, name)

    from pyspark.sql.window import Window as W

    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc"))
    return (
        out.select("qid", "doc", "n_hit_terms", F.round("score", 4).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "qid",
            "rank",
            F.col("doc").alias("doc_id"),
            F.col("n_hit_terms").cast("int").alias("n_hit_terms"),
            "score",
        )
        .orderBy("qid", "rank")
    )


def _bm25_gate_oracle() -> str:
    from sdc_spark.plans.retrieval_q import _bm25_batch_sql

    return (
        r"""
    WITH q(qid, term) AS (
        VALUES (0, 'vector'), (0, 'stream'),
               (1, 'hash'), (1, 'join'),
               (2, 'customer'), (2, 'filter'), (2, 'merge')
    )
    """
        + "SELECT qid, rank, doc_id, n_hit_terms, score FROM ("
        + _bm25_batch_sql("1 = 1", 1)
        + ") ORDER BY qid, rank"
    )


oracle("streaming_bm25_gate_e2e", _bm25_gate_oracle())
