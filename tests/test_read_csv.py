"""read_csv parameter-surface differential tests vs pandas.read_csv
(ref arglist sdc/datatypes/hpat_pandas_functions.py:101-140)."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.sources.readers import read_csv, read_table


@pytest.fixture(scope="module")
def csv_path(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("csv_src") / "events.csv"
    pdf = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .toPandas()
        .sort_values("event_id")
    )
    pdf.to_csv(out, index=False)
    return str(out)


def test_read_csv_usecols_dtype(spark, csv_path):
    got = (
        read_csv(
            spark,
            csv_path,
            usecols=["event_id", "value", "event_type"],
            dtype={"value": "double", "event_id": "long"},
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        pd.read_csv(csv_path, usecols=["event_id", "value", "event_type"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["event_id", "value", "event_type"]
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_read_csv_parse_dates_converters(spark, csv_path):
    got = (
        read_csv(
            spark,
            csv_path,
            parse_dates=["ts"],
            converters={"event_type": lambda c: F.upper(c)},
        )
        .select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        pd.read_csv(csv_path, parse_dates=["ts"])
        .assign(event_type=lambda d: d.event_type.str.upper())[
            ["event_id", "ts", "event_type"]
        ]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert str(got["ts"].dtype).startswith("datetime64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_read_csv_skiprows_names(spark, csv_path):
    got = (
        read_csv(
            spark,
            csv_path,
            skiprows=2,
            header=False,
            names=["a", "b", "c", "d", "e"],
            infer_schema=True,
        )
        .toPandas()
        .sort_values("a", key=lambda s: s.astype(int))
        .reset_index(drop=True)
    )
    exp = (
        pd.read_csv(csv_path, skiprows=2, header=None, names=["a", "b", "c", "d", "e"])
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["a"].astype(int).tolist() == exp["a"].astype(int).tolist()
    assert got["c"].tolist() == exp["c"].tolist()
