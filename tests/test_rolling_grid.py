"""Rolling kernel grid vs pandas — the reference's test_rolling.py runs
kernels x dtypes x (window, min_periods) (152 tests,
sdc/tests/test_rolling.py); this is the same grid compressed: each Spark
query evaluates ONE kernel/window combo over a NaN-injected series and
diffs against pandas exactly.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from sdc_spark.frame import from_pandas

KERNELS = ["sum", "mean", "min", "max", "std", "var", "median", "count", "skew", "kurt"]
COMBOS = [(3, 1), (7, 4), (12, 12)]


@pytest.fixture(scope="module")
def series_pair(spark):
    rng = np.random.RandomState(42)
    ps = pd.Series(rng.randn(200) * 10, name="v")
    ps[ps.sample(25, random_state=7).index] = np.nan
    return from_pandas(spark, ps.to_frame())["v"], ps


@pytest.mark.parametrize("window,minp", COMBOS)
@pytest.mark.parametrize("kernel", KERNELS)
def test_rolling_kernel_grid(series_pair, kernel, window, minp):
    s, ps = series_pair
    got = getattr(s.rolling(window, min_periods=minp), kernel)().to_pandas()
    exp = getattr(ps.rolling(window, min_periods=minp), kernel)()
    pd.testing.assert_series_equal(
        got, exp, check_names=False, check_dtype=False, atol=1e-8, rtol=1e-8
    )


def test_rolling_quantile_grid(series_pair):
    s, ps = series_pair
    for q in (0.1, 0.5, 0.9):
        got = s.rolling(8, min_periods=5).quantile(q).to_pandas()
        exp = ps.rolling(8, min_periods=5).quantile(q)
        pd.testing.assert_series_equal(
            got, exp, check_names=False, check_dtype=False, atol=1e-8
        )
