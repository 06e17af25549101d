"""Rolling-window statistics through the facade — the sdc_spark spelling
of the reference's series rolling examples
(/root/reference/examples/series/rolling/*.py: rolling mean/std/corr over
a float series with min_periods). The same method chain runs the
distributed boundary-context rolling machinery (operators/order.py +
frame/rolling.py) instead of a single-node kernel.

Run:  python examples/series_rolling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from sdc_spark.frame import from_pandas
from sdc_spark.session import get_spark


def main() -> None:
    spark = get_spark("example_series_rolling")
    ps = pd.Series([4.0, 3.0, 5.0, 2.0, 6.0, 4.0, 7.0, 2.0, 8.0], name="v")
    s = from_pandas(spark, ps.to_frame())["v"]

    roll = s.rolling(3, min_periods=2)
    out = pd.DataFrame(
        {
            "value": ps,
            "roll_mean": roll.mean().to_pandas(),
            "roll_std": roll.std().to_pandas(),
            "roll_max": roll.max().to_pandas(),
        }
    )
    print(out)
    # pandas-differential sanity: identical to pandas' own rolling
    pd.testing.assert_series_equal(
        out["roll_mean"], ps.rolling(3, min_periods=2).mean(),
        check_names=False,
    )
    print("matches pandas rolling exactly")


if __name__ == "__main__":
    main()
