"""Streaming execution tests: the same expressions that pass the batch
oracle, run incrementally through Structured Streaming (memory sink)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.sources.readers import read_table
from sdc_spark.streaming.stateful import running_ema
from sdc_spark.streaming.windows import session_agg_stream, tumbling_agg, tumbling_agg_batch


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-write events as a µs-timestamp parquet dir (streaming source needs
    a directory + a Spark-readable schema; the raw file is TIMESTAMP(NANOS))."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    read_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)

    got = _run_stream(spark, tumbling_agg(stream_df), "tumbling_out").collect()
    exp = tumbling_agg_batch(batch_df).collect()

    key = lambda r: (r.win_start, r.event_type)  # noqa: E731
    got_m = {key(r): (r.n_events, r.sum_value) for r in got}
    exp_m = {key(r): (r.n_events, r.sum_value) for r in exp}
    # append mode only emits windows past the watermark; everything emitted
    # must match the batch answer, and most windows must have been emitted
    assert got_m, "stream emitted nothing"
    assert all(got_m[k] == exp_m[k] for k in got_m)
    assert len(got_m) >= 0.8 * len(exp_m)


def test_session_window_stream_runs(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    out = _run_stream(spark, session_agg_stream(stream_df), "session_out").collect()
    assert out
    assert all(r.n_events >= 1 for r in out)


def test_stateful_ema(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    out = _run_stream(
        spark, running_ema(stream_df, alpha=0.2), "ema_out", mode="update"
    ).collect()
    assert out
    # final EMA per user should equal a driver-side replay
    import pandas as pd

    pdf = batch_df.select("user_id", "ts", "value").toPandas().sort_values("ts")
    for r in out:
        vals = pdf[pdf.user_id == r.user_id]["value"].tolist()
        ema = None
        for v in vals:
            ema = float(v) if ema is None else 0.2 * float(v) + 0.8 * ema
        assert r.n_seen == len(vals)
        assert abs(r.ema - ema) < 1e-9


def test_streaming_exact_dedup(spark, sf_dir, tmp_path_factory):
    """Streaming dedup emits one row per distinct content hash (all test
    events fit inside the watermark, so it must equal batch distinct)."""
    from sdc_spark.streaming.dedup_join import streaming_exact_dedup

    out_dir = str(tmp_path_factory.mktemp("docs_stream"))
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    docs.write.mode("overwrite").parquet(out_dir)
    batch_df = spark.read.parquet(out_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(out_dir)

    got = _run_stream(
        spark, streaming_exact_dedup(stream_df, watermark="10 minutes"), "dedup_out"
    ).collect()

    from sdc_spark.operators.dedup import exact_dedup

    n_distinct = exact_dedup(batch_df, "text", "doc_id").count()
    assert len(got) == n_distinct
    assert len({r.content_hash for r in got}) == len(got)


def test_stream_stream_interval_join(spark, sf_dir, tmp_path_factory):
    """Stream-stream equi+interval join matches the batch join with the
    same predicate (closed input, generous watermark)."""
    from sdc_spark.streaming.dedup_join import stream_stream_interval_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    left_dir = str(tmp_path_factory.mktemp("ss_left"))
    right_dir = str(tmp_path_factory.mktemp("ss_right"))
    ev.write.mode("overwrite").parquet(left_dir)
    ev.select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id"),
        F.col("ts").alias("r_ts"),
    ).write.mode("overwrite").parquet(right_dir)

    lb = spark.read.parquet(left_dir)
    rb = spark.read.parquet(right_dir)
    ls = spark.readStream.schema(lb.schema).parquet(left_dir)
    rs = spark.readStream.schema(rb.schema).parquet(right_dir)

    joined = stream_stream_interval_join(
        ls, rs, "ts", "r_ts", on="user_id", horizon="10 minutes", watermark="4 hours"
    ).select("event_id", "r_event_id")
    got = _run_stream(spark, joined, "ssj_out").count()

    exp = (
        lb.alias("l")
        .join(
            rb.alias("r"),
            F.expr(
                "l.user_id = r.user_id AND r.r_ts >= l.ts "
                "AND r.r_ts <= l.ts + INTERVAL 10 minutes"
            ),
        )
        .count()
    )
    assert got == exp > 0


def test_sliding_stream_matches_batch(spark, events_stream_dir):
    """Sliding (hopping) windows: stream result must agree with the batch
    twin on every emitted pane (window=10m, slide=5m → 2 panes/event)."""
    from sdc_spark.streaming.windows import sliding_agg

    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)

    got = _run_stream(spark, sliding_agg(stream_df), "sliding_out").collect()
    exp = (
        batch_df.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
        .collect()
    )
    key = lambda r: (r.win_start, r.event_type)  # noqa: E731
    got_m = {key(r): (r.n_events, r.sum_value) for r in got}
    exp_m = {key(r): (r.n_events, r.sum_value) for r in exp}
    assert got_m, "stream emitted nothing"
    assert all(got_m[k] == exp_m[k] for k in got_m)
    assert len(got_m) >= 0.8 * len(exp_m)


def test_stateful_anomaly_zscore_matches_batch(spark, events_stream_dir):
    """The Welford streaming scorer must agree with the window batch twin
    on every (user, event) it emits — state carries across micro-batches,
    so run availableNow over the whole directory and compare exactly."""
    from sdc_spark.streaming.stateful import anomaly_zscore, anomaly_zscore_batch

    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)

    got = _run_stream(
        spark, anomaly_zscore(stream_df, 2.5, 5), "anom_out", mode="append"
    ).collect()
    exp = anomaly_zscore_batch(batch_df, 2.5, 5).collect()

    def zkey(z):
        return None if z is None else round(z, 6)

    got_m = {(r.user_id, r.event_id): (r.n_prior, zkey(r.zscore), r.is_anomaly) for r in got}
    exp_m = {(r.user_id, r.event_id): (r.n_prior, zkey(r.zscore), r.is_anomaly) for r in exp}
    assert len(got_m) == len(exp_m)
    mismatched = [k for k in exp_m if got_m.get(k) != exp_m[k]]
    assert not mismatched, f"{len(mismatched)} mismatches, e.g. {mismatched[:3]}"
    assert any(v[2] for v in got_m.values()), "no anomalies flagged at z=2.5"


def test_streaming_near_dedup_against_index(spark, sf_dir, tmp_path_factory):
    """Incoming docs that near-duplicate the indexed corpus must hit the
    static LSH index through the stream-static join; novel docs must not."""
    from sdc_spark.operators.dedup import lsh_band_table
    from sdc_spark.streaming.dedup_join import streaming_near_dedup_against_index

    docs = read_table(spark, sf_dir, "documents")
    index = lsh_band_table(docs, "text", "doc_id").localCheckpoint(eager=True)

    # stream: 5 exact copies of corpus docs (near-dups by construction)
    # and 5 novel word-soup docs that share no 3-gram with the corpus
    copies = (
        docs.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text", "ts" if "ts" in docs.columns else F.lit(None))
        .select("doc_id", "text")
    )
    novel = spark.createDataFrame(
        [(200000 + i, f"zzq{i} wwx{i} yyk{i} vvm{i} uun{i} ttb{i}") for i in range(5)],
        ["doc_id", "text"],
    )
    src_dir = str(tmp_path_factory.mktemp("near_dedup_stream"))
    copies.unionByName(novel).write.mode("overwrite").parquet(src_dir)

    batch_src = spark.read.parquet(src_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(src_dir)
    out = streaming_near_dedup_against_index(stream_src, index)
    got = _run_stream(spark, out, "near_dedup_out").collect()

    hit_ids = {r.incoming_id for r in got}
    assert all(i in hit_ids for i in range(100000, 100005)), hit_ids
    assert all(i not in hit_ids for i in range(200000, 200005)), hit_ids


def test_streaming_near_dedup_against_persisted_index(
    spark, sf_dir, tmp_path_factory
):
    """The production pairing: the stream screens against the RELOADED
    bucketed band table (dedup.write_lsh_index -> spark.table), not an
    in-session frame — the static side of the stream-static join is the
    same persisted index the batch ingest loop maintains, so one index
    serves both halves of the pipeline."""
    from sdc_spark.operators import dedup as sdedup
    from sdc_spark.streaming.dedup_join import streaming_near_dedup_against_index

    docs = read_table(spark, sf_dir, "documents")
    root = str(tmp_path_factory.mktemp("stream_lshidx"))
    bands_t, _ = sdedup.write_lsh_index(
        spark, docs, "text", "doc_id", "streamtest", path_root=root
    )

    copies = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(200000 + i, f"qqz{i} xxw{i} kky{i} mmv{i} nnu{i} bbt{i}") for i in range(5)],
        ["doc_id", "text"],
    )
    src_dir = str(tmp_path_factory.mktemp("near_dedup_stream2"))
    copies.unionByName(novel).write.mode("overwrite").parquet(src_dir)

    batch_src = spark.read.parquet(src_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(src_dir)
    out = streaming_near_dedup_against_index(stream_src, spark.table(bands_t))
    got = _run_stream(spark, out, "near_dedup_out2").collect()

    hit_ids = {r.incoming_id for r in got}
    assert all(i in hit_ids for i in range(100000, 100005)), hit_ids
    assert all(i not in hit_ids for i in range(200000, 200005)), hit_ids
    sdedup.drop_lsh_index(spark, "streamtest", path_root=root)


def test_trending_topk_stream_matches_batch(spark, events_stream_dir):
    """foreachBatch-maintained trending table must equal the batch top-k
    after availableNow drains the directory."""
    from sdc_spark.streaming.windows import trending_topk_stream

    batch_df = spark.read.parquet(events_stream_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)

    q = trending_topk_stream(stream_df, "trend_sink", k=3, window="6 hours")
    q.awaitTermination(120)

    got = {
        (r.win_start, r.rk): (r.event_type, r.n)
        for r in spark.table("global_temp.trend_sink").collect()
    }

    from pyspark.sql import Window as W

    counts = (
        batch_df.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("win_start"), "event_type", "n")
    )
    wr = W.partitionBy("win_start").orderBy(F.desc("n"), "event_type")
    exp = {
        (r.win_start, r.rk): (r.event_type, r.n)
        for r in counts.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert got == exp


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """An event older than the watermark arriving in a later micro-batch is
    EXCLUDED from its (already-finalized) window — the late-data contract
    of tumbling_agg. Two micro-batches: batch 1 fills window [10:00,10:05)
    and sets the watermark past it via a 10:10 probe; batch 2 delivers a
    straggler for 10:01 which must be dropped, plus a fresh 10:12 event
    that advances the watermark far enough to flush every window."""
    import time

    src = str(tmp_path_factory.mktemp("late_src"))
    rows1 = [
        ("2024-01-01 10:00:30", "click", 1.0),
        ("2024-01-01 10:01:30", "click", 2.0),
        ("2024-01-01 10:10:00", "click", 4.0),  # advances watermark to 10:09
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        list(rows), "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    mk(rows1).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    from sdc_spark.streaming.windows import tumbling_agg

    q = (
        tumbling_agg(stream, ts_col="ts", window="5 minutes", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.2)
        rows2 = [
            ("2024-01-01 10:01:45", "click", 100.0),  # straggler: before wm 10:09
            ("2024-01-01 10:12:00", "click", 8.0),  # flushes remaining windows
        ]
        mk(rows2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    out = {
        r.win_start.strftime("%H:%M"): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM late_out").collect()
        if r.event_type == "click"
    }
    # the 10:00 window was finalized with exactly the 2 on-time events;
    # the 100.0 straggler is gone
    assert out.get("10:00") == (2, 3.0), out
    # batch semantics WOULD count it - proving the drop is watermark-driven
    from sdc_spark.streaming.windows import tumbling_agg_batch

    batch = tumbling_agg_batch(
        spark.read.parquet(src), ts_col="ts", window="5 minutes"
    ).collect()
    bm = {r.win_start.strftime("%H:%M"): r.n_events for r in batch}
    assert bm["10:00"] == 3


def test_checkpoint_restart_exactly_once(spark, tmp_path_factory):
    """Stop/restart recovery: a second query started on the SAME
    checkpoint processes only files that arrived after the first run —
    no reprocessing, no loss (the exactly-once file-source contract a
    production pipeline restarts rely on)."""
    src = str(tmp_path_factory.mktemp("ck_src"))
    sink = str(tmp_path_factory.mktemp("ck_sink"))
    ckpt = str(tmp_path_factory.mktemp("ck_state"))

    def put(lo, hi):
        spark.range(lo, hi).selectExpr(
            "id", "id * 2 AS doubled"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    put(0, 100)
    run_once()
    first = spark.read.parquet(sink).count()
    assert first == 100

    put(100, 150)
    run_once()  # new query object, same checkpoint
    out = spark.read.parquet(sink)
    assert out.count() == 150  # 50 new, zero duplicated
    assert out.select("id").distinct().count() == 150
    assert out.filter("doubled != id * 2").count() == 0


def test_idle_session_timeout_emission(spark, tmp_path_factory):
    """Timeout-driven emission: user 1's burst is emitted as a closed
    session only after OTHER users' later events advance the event-time
    watermark past last-activity + gap — no new data for user 1 needed."""
    from sdc_spark.streaming.stateful import idle_closed_sessions

    src = str(tmp_path_factory.mktemp("sess_src"))

    def put(rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).selectExpr(
            "user_id", "to_timestamp(ts_s) AS ts", "value"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 1 burst at 10:00-10:02; user 2 keeps the clock moving
    put(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:01:00", 2.0),
            (1, "2024-01-01 10:02:00", 3.0),
            (2, "2024-01-01 10:03:00", 7.0),
        ]
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        idle_closed_sessions(stream, gap="5 minutes", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_close_out")
        .start()
    )
    try:
        q.processAllAvailable()
        early = spark.sql("SELECT * FROM sess_close_out").collect()
        assert not [r for r in early if r.user_id == 1], "closed too early"
        # batch 2: only user 2 speaks, at 10:20 -> watermark 10:19 passes
        # user 1's 10:02 + 5min gap -> user 1's session must close
        put([(2, "2024-01-01 10:20:00", 9.0)])
        q.processAllAvailable()
        put([(2, "2024-01-01 10:40:00", 9.0)])  # extra advance (timer fire)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM sess_close_out").collect()}
    assert 1 in rows, "user 1 session never closed"
    r1 = rows[1]
    assert r1.n_events == 3 and r1.sum_value == 6.0
    assert r1.session_start.strftime("%H:%M") == "10:00"
    assert r1.session_end.strftime("%H:%M") == "10:02"


def test_tws_running_topk(spark, events_stream_dir):
    """transformWithStateInPandas running top-k converges to the batch
    twin. The BATCH twin and the availability gate assert in every
    container; the stream half is environment-gated (TWS needs the
    protobuf runtime) and asserts wherever that runtime imports — the
    test always runs, never skips."""
    from sdc_spark.streaming.tws import (
        ROCKSDB_PROVIDER,
        running_topk,
        running_topk_batch,
        tws_available,
    )

    # batch twin: hand-checked per-key top-k + count on a tiny frame
    tiny = spark.createDataFrame(
        [(1, 5.0), (1, 9.0), (1, 7.0), (1, 1.0), (2, 3.0)],
        "user_id long, value double",
    )
    got = {
        r.user_id: (r.n_seen, r.topk)
        for r in running_topk_batch(tiny, 2).collect()
    }
    assert got == {1: (4, [9.0, 7.0]), 2: (1, [3.0])}

    assert isinstance(tws_available(), bool)
    if not tws_available():
        # gate contract: without the runtime, the operator is absent by
        # environment, not silently degraded — nothing more to assert here
        return

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        batch_df = spark.read.parquet(events_stream_dir)
        stream_df = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
        out = _run_stream(
            spark, running_topk(stream_df, 3), "tws_topk_out", mode="update"
        ).collect()
        got = {r.user_id: (r.n_seen, [round(v, 6) for v in r.topk]) for r in out}
        want = {
            r.user_id: (r.n_seen, [round(v, 6) for v in r.topk])
            for r in running_topk_batch(batch_df, 3).collect()
        }
        assert got == want
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_foreachbatch_incremental_upsert(spark, tmp_path_factory):
    """Production CDC-sink pattern: a keyed parquet state directory is
    upserted per micro-batch via foreachBatch + operators/upsert.upsert.
    Two batches with overlapping keys must converge to the same state a
    single batch-mode latest_by_key compaction produces."""
    import pandas as pd

    from sdc_spark.operators.upsert import latest_by_key, upsert

    src_dir = str(tmp_path_factory.mktemp("cdc_src"))
    state_dir = str(tmp_path_factory.mktemp("cdc_state"))
    chk_dir = str(tmp_path_factory.mktemp("cdc_chk"))

    schema = "k long, v string, ver long"

    def put(rows, name):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "v", "ver"])
        ).coalesce(1).write.mode("append").parquet(src_dir)

    def apply_batch(batch_df, batch_id):
        batch = latest_by_key(batch_df, ["k"], "ver", tie_breaker="v")
        try:
            target = batch_df.sparkSession.read.parquet(state_dir)
            merged = upsert(target, batch, ["k"])
        except Exception:  # first batch: no state yet
            merged = batch
        # rewrite state atomically-enough for a test (real deployments use
        # a transactional table format for the sink)
        merged.localCheckpoint(eager=True).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    put([(1, "a", 1), (2, "b", 1)], "b1")
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", chk_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable(); q.stop()

    put([(2, "b2", 2), (3, "c", 1)], "b2")
    q = (
        spark.readStream.schema(schema).parquet(src_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", chk_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable(); q.stop()

    got = {
        (r.k, r.v, r.ver) for r in spark.read.parquet(state_dir).collect()
    }
    want_df = latest_by_key(
        spark.read.parquet(src_dir), ["k"], "ver", tie_breaker="v"
    )
    want = {(r.k, r.v, r.ver) for r in want_df.collect()}
    assert got == want and got == {(1, "a", 1), (2, "b2", 2), (3, "c", 1)}


def test_streaming_pack_matches_batch(spark, tmp_path_factory):
    """Incremental per-source packing across two micro-batches must equal
    the one-shot batch packing of the full corpus (docs arrive in doc_id
    order per source — the append-only layout)."""
    import pandas as pd

    from pyspark.sql import Window as W
    from sdc_spark.streaming.stateful import streaming_pack_sequences

    src_dir = str(tmp_path_factory.mktemp("pack_src"))
    budget = 100

    def put(rows):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["source", "doc_id", "n_tok"])
        ).coalesce(1).write.mode("append").parquet(src_dir)

    b1 = [("web", 1, 40), ("web", 2, 80), ("book", 3, 150), ("web", 4, 10)]
    b2 = [("web", 5, 95), ("book", 6, 60), ("book", 7, 0), ("web", 8, 130)]
    put(b1)

    schema = "source string, doc_id long, n_tok long"
    chk = str(tmp_path_factory.mktemp("pack_chk"))
    out_dir = str(tmp_path_factory.mktemp("pack_sink"))

    def run_batch():
        # file sink (memory sink cannot recover from a checkpoint, and the
        # per-source token state must survive across the two runs)
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            streaming_pack_sequences(stream, budget)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable(); q.stop()

    run_batch()
    put(b2)
    run_batch()

    got = {
        (r.source, r.doc_id): (r.n_tok, r.pack_id, r.offset, r.spans_boundary)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin: per-source window cumsum over the full corpus
    full = spark.createDataFrame(
        pd.DataFrame(b1 + b2, columns=["source", "doc_id", "n_tok"])
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    twin = (
        full.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tok"))
        .select(
            "source", "doc_id", "n_tok",
            F.expr(f"start div {budget}").alias("pack_id"),
            (F.col("start") % budget).alias("offset"),
            (
                (F.col("n_tok") > 0)
                & (F.expr(f"start div {budget}") != F.expr(f"(cum - 1) div {budget}"))
            ).alias("spans_boundary"),
        )
    )
    want = {
        (r.source, r.doc_id): (r.n_tok, r.pack_id, r.offset, r.spans_boundary)
        for r in twin.collect()
    }
    assert got == want and len(got) == 8


def test_streaming_substring_screen_matches_batch(spark, sf_dir, tmp_path_factory):
    """The streaming ExactSubstr gate over the persisted gram-hash set
    must mark exactly the positions the batch screen marks — merged to
    spans, the streamed result equals screen_substrings_against_index
    for a batch with no within-batch repeats (the documented stateless
    scope)."""
    from sdc_spark.operators import dedup as sdedup
    from sdc_spark.operators.dedup import _merge_marked_positions
    from sdc_spark.streaming.dedup_join import streaming_substring_screen

    docs = read_table(spark, sf_dir, "documents")
    root = str(tmp_path_factory.mktemp("stream_subidx"))
    name = "streamsubtest"
    sdedup.drop_substring_index(spark, name, path_root=root)
    table = sdedup.write_substring_index(
        spark, docs, "text", "doc_id", name, path_root=root
    )

    # copies of corpus docs (every >= 50-char window indexed) + novel
    # word-soup docs long enough to have windows but sharing none
    copies = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [
            (200000 + i, " ".join(f"zq{i}w{j}" for j in range(30)))
            for i in range(3)
        ],
        ["doc_id", "text"],
    )
    src_dir = str(tmp_path_factory.mktemp("substr_stream"))
    copies.unionByName(novel).write.mode("overwrite").parquet(src_dir)

    batch_src = spark.read.parquet(src_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(src_dir)
    out = streaming_substring_screen(stream_src, spark.table(table))
    got_marks = _run_stream(spark, out, "substr_screen_out")

    # batch-side islands merge over the streamed marks == batch screen
    got_spans = {
        (r.doc, r.span_start, r.span_end)
        for r in _merge_marked_positions(
            got_marks.select(F.col("incoming_id").alias("doc"), "pos"), 50
        ).collect()
    }
    expect = {
        (r.doc, r.span_start, r.span_end)
        for r in sdedup.screen_substrings_against_index(
            spark, batch_src, "text", "doc_id", name, min_len=50
        ).collect()
    }
    assert got_spans == expect
    # exact copies are fully covered; novel docs never hit
    assert {d for d, _, _ in got_spans} == set(range(100000, 100005))
    sdedup.drop_substring_index(spark, name, path_root=root)


def test_streaming_bm25_against_persisted_index(spark, sf_dir, tmp_path_factory):
    """Query stream served by the persisted posting index: streamed
    candidate postings, completed per micro-batch through the SHARED
    scorer, must equal the batch index server score-for-score."""
    import sdc_spark.operators.retrieval as sret
    from sdc_spark.streaming.dedup_join import streaming_bm25_candidates

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    name = "pytest_stream_lexidx"
    sret.drop_posting_index(spark, name)
    try:
        sret.write_posting_index(spark, docs, "text", "doc_id", name)
        q_rows = [(0, "vector"), (0, "hash"), (1, "merge"), (1, "stream")]
        qdf = spark.createDataFrame(q_rows, "qid int, term string")
        src_dir = str(tmp_path_factory.mktemp("bm25_query_stream"))
        qdf.write.mode("overwrite").parquet(src_dir)

        stream_src = spark.readStream.schema(qdf.schema).parquet(src_dir)
        cands = streaming_bm25_candidates(
            stream_src, spark.table(f"postings_{name}")
        )
        got_cands = _run_stream(spark, cands, "bm25_stream_out")

        stats = spark.table(f"lexstats_{name}").agg(
            F.sum("n_docs").alias("n_docs"),
            (F.sum("sum_dl").cast("double") / F.sum("n_docs").cast("double")).alias("avgdl"),
        )
        streamed = {
            (r["qid"], r["doc"]): (r["n_hit_terms"], round(r["score"], 9))
            for r in sret.score_matched_postings(got_cands, stats).collect()
        }
        batch = {
            (r["qid"], r["doc"]): (r["n_hit_terms"], round(r["score"], 9))
            for r in sret.bm25_from_index(spark, name, qdf).collect()
        }
        assert streamed == batch and len(batch) > 0
    finally:
        sret.drop_posting_index(spark, name)
