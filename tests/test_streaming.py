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
