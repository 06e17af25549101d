"""Differential tests for df/series.resample(rule) against pandas,
including empty-bucket densification and OHLC bars."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from sdc_spark.frame import from_pandas


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.RandomState(11)
    n = 400
    # irregular event times with a deliberate 3-hour silence gap so the
    # dense-axis path (empty buckets) is exercised
    offs = np.cumsum(rng.randint(30, 900, n))
    offs[200:] += 3 * 3600
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(offs, unit="s")
    return pd.DataFrame(
        {"ts": ts, "v": rng.randn(n) * 10 + 50, "w": rng.randint(0, 100, n).astype(float)}
    )


@pytest.fixture(scope="module")
def sf(spark, pdf):
    return from_pandas(spark, pdf)


def _frame_eq(got, exp):
    g = got.to_pandas().sort_index()
    e = exp.sort_index()
    g.index = pd.to_datetime(g.index)
    pd.testing.assert_frame_equal(
        g[sorted(e.columns)], e[sorted(e.columns)], check_dtype=False, check_freq=False, check_names=False
    )


@pytest.mark.parametrize("rule", ["1h", "15min"])
@pytest.mark.parametrize("kind", ["mean", "sum", "count", "min", "max"])
def test_frame_resample_matches_pandas(sf, pdf, rule, kind):
    got = getattr(sf.resample(rule, on="ts"), kind)()
    exp = getattr(pdf.resample(rule, on="ts")[["v", "w"]], kind)()
    _frame_eq(got, exp)


def test_series_resample_matches_pandas(spark, pdf):
    s = pdf.set_index("ts")["v"]
    ss = from_pandas(spark, pdf.set_index("ts"))["v"]
    got = ss.resample("30min").mean().to_pandas().sort_index()
    exp = s.resample("30min").mean()
    got.index = pd.to_datetime(got.index)
    pd.testing.assert_series_equal(
        got, exp, check_dtype=False, check_names=False, check_freq=False
    )


def test_frame_resample_ohlc_matches_pandas(sf, pdf):
    got = sf.resample("1h", on="ts").ohlc("v").to_pandas().sort_index()
    got.index = pd.to_datetime(got.index)
    exp = pdf.set_index("ts")["v"].resample("1h").ohlc()
    # pandas ohlc leaves empty buckets as NaN rows and has no volume col
    pd.testing.assert_frame_equal(
        got[["open", "high", "low", "close"]], exp,
        check_dtype=False, check_freq=False, check_names=False,
    )
    vol = pdf.set_index("ts")["v"].resample("1h").count()
    pd.testing.assert_series_equal(
        got["volume"], vol, check_dtype=False, check_names=False, check_freq=False
    )


def test_resample_first_last(sf, pdf):
    got_f = sf.resample("1h", on="ts").first()
    got_l = sf.resample("1h", on="ts").last()
    exp_f = pdf.resample("1h", on="ts")[["v", "w"]].first()
    exp_l = pdf.resample("1h", on="ts")[["v", "w"]].last()
    _frame_eq(got_f, exp_f)
    _frame_eq(got_l, exp_l)


def test_resample_rejects_bad_rule(sf):
    with pytest.raises(ValueError):
        sf.resample("2fortnight", on="ts").mean()
    with pytest.raises(ValueError):
        sf.resample("3M", on="ts").mean()


def test_resample_degenerate_inputs(spark):
    # empty frame -> empty result (pandas: empty with the same columns)
    empty = pd.DataFrame({"ts": pd.to_datetime([]), "v": pd.Series([], dtype=float)})
    se = from_pandas(spark, empty)
    assert se.resample("1h", on="ts").mean().to_pandas().empty
    # single row -> exactly one bucket, value preserved
    one = pd.DataFrame({"ts": [pd.Timestamp("2024-05-05 07:33:20")], "v": [4.25]})
    so = from_pandas(spark, one)
    got = so.resample("15min", on="ts").sum().to_pandas()
    assert len(got) == 1
    assert got["v"].iloc[0] == 4.25
    assert pd.to_datetime(got.index[0]) == pd.Timestamp("2024-05-05 07:30:00")
    # all-null values -> buckets exist, aggregates null (count 0)
    nulls = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=4, freq="20min"),
            "v": [np.nan] * 4,
        }
    )
    sn = from_pandas(spark, nulls)
    cnt = sn.resample("1h", on="ts").count().to_pandas()
    assert cnt["v"].sum() == 0


def test_groupby_resample_matches_pandas(spark):
    rng = np.random.RandomState(5)
    n = 300
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "ts": pd.Timestamp("2024-06-01")
            + pd.to_timedelta(np.sort(rng.randint(0, 48 * 3600, n)), unit="s"),
            "v": rng.randn(n) * 4 + 10,
        }
    )
    sf2 = from_pandas(spark, pdf)
    for kind in ("mean", "sum", "count"):
        got = (
            getattr(sf2.groupby("g").resample("2h", on="ts"), kind)()
            .to_pandas()
            .sort_values(["g"])
        )
        got = got.reset_index().rename(columns={"index": "ts_b"})
        got["ts_b"] = pd.to_datetime(got["ts_b"])
        got = got.sort_values(["g", "ts_b"]).reset_index(drop=True)
        exp = (
            getattr(pdf.groupby("g").resample("2h", on="ts")[["v"]], kind)()
            .reset_index()
            .rename(columns={"ts": "ts_b"})
            .sort_values(["g", "ts_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["g", "ts_b", "v"]], exp[["g", "ts_b", "v"]],
            check_dtype=False, check_names=False,
        )


def test_resample_pre_epoch_timestamps(spark):
    """Multiple-unit rules bucket pre-1970 timestamps to the correct
    (earlier) boundary: Spark's % truncates toward zero, so the naive
    `us - us % step` floors negative epochs to the WRONG, later bucket —
    the operator must floor toward -inf (pmod)."""
    ts = pd.to_datetime(
        ["1969-12-31 23:53:00", "1969-12-31 23:59:59", "1969-06-15 07:08:09",
         "1970-01-01 00:07:30", "1968-02-29 12:00:01"]
    )
    pdf = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    sf = from_pandas(spark, pdf)
    got = sf.resample("15min", on="ts").sum()
    exp = pdf.resample("15min", on="ts")["v"].sum()
    g = got.to_pandas().sort_index()
    g.index = pd.to_datetime(g.index)
    # compare only non-empty buckets (dense axis spans 1968->1970 here;
    # pandas emits the same dense axis, so align on the joined index)
    e = exp[exp != 0]
    gg = g["v"][g["v"] != 0]
    pd.testing.assert_series_equal(gg, e, check_names=False, check_dtype=False, check_freq=False)
