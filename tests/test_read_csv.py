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
    sdf = read_csv(
        spark,
        csv_path,
        skiprows=2,
        header=False,
        names=["a", "b", "c", "d", "e"],
        infer_schema=True,
    )
    exp = (
        pd.read_csv(csv_path, skiprows=2, header=None, names=["a", "b", "c", "d", "e"])
        .sort_values("a")
        .reset_index(drop=True)
    )
    # dtypes must be re-inferred after the text pre-pass (not left string)
    types = dict(sdf.dtypes)
    assert types["a"] == "bigint" and types["b"] == "bigint"
    assert types["d"] == "double"
    assert types["c"] == "string" and types["e"] == "string"
    got = sdf.toPandas().sort_values("a").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["a"].tolist() == exp["a"].tolist()
    assert got["c"].tolist() == exp["c"].tolist()
    assert got["d"].tolist() == pytest.approx(exp["d"].tolist())


def test_read_csv_skiprows_header_keeps_colliding_rows(spark, tmp_path):
    # a data row byte-identical to the header must NOT be dropped
    p = tmp_path / "tricky.csv"
    p.write_text("# preamble junk\nx,y\n1,2\nx,y\n3,4\n")
    sdf = read_csv(spark, str(p), skiprows=1, header=True)
    got = sdf.toPandas()
    assert len(got) == 3  # rows: (1,2), (x,y), (3,4)
    exp = pd.read_csv(str(p), skiprows=1)
    assert len(exp) == 3
    assert sorted(got["x"].astype(str).tolist()) == sorted(exp["x"].astype(str).tolist())


def test_numpy_binary_roundtrip(spark, tmp_path):
    import glob

    import numpy as np

    from sdc_spark.sources.writers import to_numpy_binary

    vals = [float(i) * 1.5 for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(4)
    out = str(tmp_path / "npbin")
    to_numpy_binary(df, "v", out)
    parts = sorted(glob.glob(out + "/part-*.bin"))
    assert len(parts) == 4
    back = np.concatenate([np.fromfile(p, dtype="float64") for p in parts])
    assert sorted(back.tolist()) == sorted(vals)


def test_read_json_malformed_modes(spark, tmp_path):
    """Corrupt ndjson lines: DROPMALFORMED drops them; PERMISSIVE
    quarantines them in _corrupt_record for auditing."""
    from sdc_spark.sources.readers import read_json

    p = tmp_path / "docs"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "v": 10}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20}\n'
        '{"id": 3 "v": broken}\n'
    )
    dropped = read_json(
        spark, str(p), schema="id long, v long", mode="DROPMALFORMED"
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 2]

    permissive = read_json(
        spark,
        str(p),
        schema="id long, v long, _corrupt_record string",
        mode="PERMISSIVE",
    )
    rows = permissive.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 2 and all(r.id is None for r in bad)
