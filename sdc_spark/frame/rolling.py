"""Series/Frame rolling — the reference's RollingType surface
(/root/reference/sdc/datatypes/hpat_pandas_series_rolling_functions.py and
…dataframe_rolling_functions.py) over sdc_spark.operators.rolling windows:
trailing row windows ordered by __index__, min_periods NULL-guard,
ddof=1."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.frame.series import IDX, VAL, SparkSeries
from sdc_spark.operators.rolling import _AGGS, _pairwise


class SeriesRolling:
    def __init__(self, s: SparkSeries, window: int, min_periods: int, center: bool = False):
        self._s = s
        if center:
            # pandas centered window: (window-1)//2 behind, window//2 ahead
            self._w = W.orderBy(IDX).rowsBetween(-((window - 1) // 2), window // 2)
        else:
            self._w = W.orderBy(IDX).rowsBetween(-(window - 1), 0)
        self._minp = min_periods

    def _roll(self, expr_fn, floating: bool = True) -> SparkSeries:
        w, minp = self._w, self._minp
        guard = lambda e: F.when(F.count(VAL).over(w) >= minp, e)  # noqa: E731
        out = self._s._df.select(IDX, guard(expr_fn(w)).alias(VAL))
        return SparkSeries(out, name=self._s.name, floating=floating)

    def sum(self):
        return self._roll(lambda w: F.sum(VAL).over(w))

    def mean(self):
        return self._roll(lambda w: F.avg(VAL).over(w))

    def min(self):
        return self._roll(lambda w: F.min(VAL).over(w))

    def max(self):
        return self._roll(lambda w: F.max(VAL).over(w))

    def count(self):
        return SparkSeries(
            self._s._df.select(IDX, F.count(VAL).over(self._w).alias(VAL)), floating=False
        )

    def std(self):
        return self._roll(lambda w: _AGGS["std"](VAL).over(w))

    def var(self):
        return self._roll(lambda w: _AGGS["var"](VAL).over(w))

    def median(self):
        return self._roll(lambda w: F.percentile(F.col(VAL), F.lit(0.5)).over(w))

    def quantile(self, q: float):
        return self._roll(lambda w: F.percentile(F.col(VAL), F.lit(q)).over(w))

    def skew(self):
        """pandas sample-adjusted skew G1 = sqrt(n(n-1))/(n-2) · g1, from
        raw power sums over the window (Spark's skewness() is the
        population g1 — reference formula sdc/functions/statistics.py:32-40
        is the pandas one)."""
        w = self._w
        x = F.col(VAL)
        n = F.count(VAL).over(w).cast("double")
        m = F.avg(VAL).over(w)
        ex2 = F.avg(x * x).over(w)
        ex3 = F.avg(x * x * x).over(w)
        m2 = ex2 - m * m
        m3 = ex3 - 3 * m * ex2 + 2 * m * m * m
        g1 = F.try_divide(m3, F.pow(m2, 1.5))
        adj = F.try_divide(F.sqrt(n * (n - 1)), n - 2)
        return self._roll_named(F.when(F.count(VAL).over(w) >= F.greatest(F.lit(self._minp), F.lit(3)), g1 * adj))

    def kurt(self):
        """pandas sample excess kurtosis from power sums:
        ((n+1)·g2 + 6) · (n−1)/((n−2)(n−3)) with g2 = m4/m2² − 3."""
        w = self._w
        x = F.col(VAL)
        n = F.count(VAL).over(w).cast("double")
        m = F.avg(VAL).over(w)
        ex2 = F.avg(x * x).over(w)
        ex3 = F.avg(x * x * x).over(w)
        ex4 = F.avg(x * x * x * x).over(w)
        m2 = ex2 - m * m
        m4 = ex4 - 4 * m * ex3 + 6 * m * m * ex2 - 3 * m * m * m * m
        g2 = F.try_divide(m4, m2 * m2) - 3
        adj = F.try_divide((n + 1) * g2 + 6, (n - 2) * (n - 3)) * (n - 1)
        return self._roll_named(
            F.when(F.count(VAL).over(w) >= F.greatest(F.lit(self._minp), F.lit(4)), adj)
        )

    def _roll_named(self, expr) -> SparkSeries:
        return SparkSeries(
            self._s._df.select(IDX, expr.alias(VAL)), name=self._s.name, floating=True
        )

    def corr(self, other: SparkSeries):
        return self._pair(other, "corr")

    def cov(self, other: SparkSeries):
        return self._pair(other, "cov")

    def _pair(self, other: SparkSeries, kind: str):
        a = self._s._df.select(IDX, F.col(VAL).alias("__l__"))
        b = other._df.select(IDX, F.col(VAL).alias("__r__"))
        j = a.join(b, IDX, "full")
        w, minp = self._w, self._minp
        expr = _pairwise("__l__", "__r__", w, kind)
        # pandas counts valid PAIRS toward min_periods, not left values
        pair_n = F.count(
            F.when(F.col("__l__").isNotNull() & F.col("__r__").isNotNull(), 1)
        ).over(w)
        guard = F.when(pair_n >= minp, expr)
        return SparkSeries(j.select(IDX, guard.alias(VAL)), floating=True)

    def apply(self, func):
        """rolling.apply via collect_list over the window + vectorized UDF
        (ref …series_rolling_functions.py:758-796 — the sanctioned slow
        path)."""

        @F.pandas_udf("double")
        def udf(arrs: pd.Series) -> pd.Series:
            return arrs.map(lambda a: float(func(np.asarray(a, dtype=float))))

        w, minp = self._w, self._minp
        lst = F.collect_list(VAL).over(w)
        guarded = F.when(F.count(VAL).over(w) >= minp, udf(lst))
        return SparkSeries(self._s._df.select(IDX, guarded.alias(VAL)), floating=True)

class FrameRolling:
    """df.rolling — per-column codegen in the reference
    (…dataframe_rolling_functions.py:86-472); per-column window exprs here."""

    def __init__(self, frame, window: int, min_periods: int):
        self._frame = frame
        self._w = W.orderBy(IDX).rowsBetween(-(window - 1), 0)
        self._minp = min_periods

    def _roll_all(self, fn):
        from sdc_spark.frame.core import SparkFrame

        w, minp = self._w, self._minp
        cols = self._frame._numeric_cols()
        exprs = [
            F.when(F.count(c).over(w) >= minp, fn(c, w)).alias(c) for c in cols
        ]
        return SparkFrame(self._frame._df.select(IDX, *exprs))

    def sum(self):
        return self._roll_all(lambda c, w: F.sum(c).over(w))

    def mean(self):
        return self._roll_all(lambda c, w: F.avg(c).over(w))

    def min(self):
        return self._roll_all(lambda c, w: F.min(c).over(w))

    def max(self):
        return self._roll_all(lambda c, w: F.max(c).over(w))

    def std(self):
        return self._roll_all(lambda c, w: F.stddev_samp(c).over(w))

    def var(self):
        return self._roll_all(lambda c, w: F.var_samp(c).over(w))

    def median(self):
        return self._roll_all(lambda c, w: F.percentile(F.col(c), F.lit(0.5)).over(w))
