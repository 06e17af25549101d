"""Hypothesis property tests for the distributed prefix-scan machinery
(operators/order.py) — the surface under shift/cumsum/ffill/pack: random
values with nulls/duplicate orderings must match pandas exactly under ANY
generated input, including empty series, all-null series, and heavy
duplication. Examples kept small (Spark session cost); the generator's
value is hitting the shapes humans skip."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from sdc_spark.frame import from_pandas

VALS = st.lists(
    st.one_of(
        st.floats(min_value=-100, max_value=100, allow_nan=False), st.none()
    ),
    min_size=0,
    max_size=24,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _series(spark, vals):
    ps = pd.Series(pd.array(vals, dtype="Float64"), name="v").astype("float64")
    return ps, from_pandas(spark, ps.to_frame())["v"]


def _eq(got: pd.Series, exp: pd.Series) -> None:
    pd.testing.assert_series_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_names=False,
        check_dtype=False,
        atol=1e-9,
    )


@given(vals=VALS)
@_SETTINGS
def test_cumsum_matches_pandas(spark, vals):
    ps, s = _series(spark, vals)
    _eq(s.cumsum().to_pandas(), ps.cumsum())


@given(vals=VALS, periods=st.sampled_from([1, 2, 5, -1, -3]))
@_SETTINGS
def test_shift_matches_pandas(spark, vals, periods):
    ps, s = _series(spark, vals)
    _eq(s.shift(periods).to_pandas(), ps.shift(periods))


@given(vals=VALS)
@_SETTINGS
def test_ffill_matches_pandas(spark, vals):
    ps, s = _series(spark, vals)
    _eq(s.ffill().to_pandas(), ps.ffill())


@given(vals=VALS)
@_SETTINGS
def test_expanding_mean_matches_pandas(spark, vals):
    ps, s = _series(spark, vals)
    _eq(s.expanding(min_periods=1).mean().to_pandas(), ps.expanding(1).mean())
