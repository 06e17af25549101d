"""Series/Frame rolling — the reference's RollingType surface
(/root/reference/sdc/datatypes/hpat_pandas_series_rolling_functions.py and
…dataframe_rolling_functions.py:86-472): trailing (or centered) row
windows ordered by __index__, min_periods NULL-guard, ddof=1.

Scale: a bare series/frame has no grouping key, so the window runs over
boundary-context-replicated range partitions (operators/order.py
with_context) — each partition carries the previous partition's last
(window-1) rows flagged as context, the window is partitioned by
__pid__, and context rows are dropped afterwards. No full-data
single-partition window. Correct while window << rows-per-partition
(pandas windows are small; range partitions are millions of rows at
scale)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.frame.series import IDX, VAL, SparkSeries
from sdc_spark.operators import order as sorder
from sdc_spark.operators.rolling import (
    _AGGS,
    _pairwise,
    kurt_expr,
    pair_count,
    skew_expr,
)


def _ctx_window(df: DataFrame, before: int, after: int):
    """(context-replicated frame, per-partition window spec). ``after``
    may be negative (closed='left'/'neither' windows end one row BEFORE
    the current row) — context replication only ever needs the clamped
    positive lookahead."""
    c = sorder.with_context(df, [IDX], before=before, after=max(after, 0))
    w = (
        W.partitionBy(sorder.PID)
        .orderBy(IDX)
        .rowsBetween(-before if before else 0, after)
    )
    return c, w


_CLOSED = ("right", "left", "both", "neither")


def _bounds(window: int, center: bool, closed: str = "right") -> tuple[int, int]:
    """(rows-behind, rows-ahead) of the window frame. ``closed`` follows
    pandas' fixed-window semantics: the conceptual interval is
    (i - window, i] and each end is included/excluded — 'right' is the
    classic trailing window (i-window+1 .. i), 'left' shifts it one row
    back (i-window .. i-1), 'both' keeps both ends (window+1 rows),
    'neither' drops both (window-1 rows). Pure frame-bound arithmetic:
    every kernel's min_periods guard counts rows inside the frame, so
    the semantics compose with no per-kernel changes (pandas
    differentials in tests/test_rolling_grid.py pin them)."""
    if closed not in _CLOSED:
        raise ValueError(f"rolling: closed={closed!r}; expected one of {_CLOSED}")
    if center:
        if closed != "right":
            raise NotImplementedError(
                "rolling: closed= with center=True is not implemented "
                "(the reference's kernels execute only trailing windows — "
                "sdc/datatypes/hpat_pandas_rolling_types.py:36-72)"
            )
        # pandas centered window: (window-1)//2 behind, window//2 ahead
        return (window - 1) // 2, window // 2
    if closed == "right":
        return window - 1, 0
    if closed == "left":
        if window == 1:
            raise NotImplementedError(
                "rolling: window=1 with closed='left' (empty frame)"
            )
        return window, -1
    if closed == "both":
        return window, 0
    # neither
    if window == 1:
        raise NotImplementedError(
            "rolling: window=1 with closed='neither' (empty frame)"
        )
    return window - 1, -1


def _check_win_type(win_type) -> None:
    if win_type is not None:
        raise NotImplementedError(
            "rolling: win_type weighted windows are not implemented. The "
            "reference carries win_type in its RollingType "
            "(sdc/datatypes/hpat_pandas_rolling_types.py:36-72) but its "
            "kernels likewise execute only unweighted windows."
        )


class SeriesRolling:
    def __init__(
        self,
        s: SparkSeries,
        window: int,
        min_periods: int | None,
        center: bool = False,
        win_type=None,
        closed: str = "right",
    ):
        _check_win_type(win_type)
        self._s = s
        self._before, self._after = _bounds(window, center, closed)
        # pandas: min_periods defaults to window for value kernels but to 0
        # for count
        self._minp = window if min_periods is None else min_periods
        self._minp_count = 0 if min_periods is None else min_periods

    def _eval(self, df: DataFrame, result_fn, out_cols):
        """Run window expressions over the context frame, drop context rows."""
        c, w = _ctx_window(df, self._before, self._after)
        exprs = result_fn(w)
        return (
            c.select(IDX, F.col(sorder.CTX), *exprs)
            .filter(~F.col(sorder.CTX))
            .select(IDX, *out_cols)
        )

    def _roll(self, expr_fn, floating: bool = True) -> SparkSeries:
        minp = self._minp
        out = self._eval(
            self._s._df.select(IDX, VAL),
            lambda w: [
                F.when(F.count(VAL).over(w) >= minp, expr_fn(w)).alias("__r__")
            ],
            [F.col("__r__").alias(VAL)],
        )
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
        # pandas guards count on the window's ROW count (not non-null
        # count): a full-size window emits its non-null count even if most
        # values are NaN
        minp = self._minp_count
        out = self._eval(
            self._s._df.select(IDX, VAL),
            lambda w: [
                F.when(
                    F.count(F.lit(1)).over(w) >= minp, F.count(VAL).over(w)
                ).alias("__r__")
            ],
            [F.col("__r__").alias(VAL)],
        )
        return SparkSeries(out, floating=False)

    def std(self):
        return self._roll(lambda w: _AGGS["std"](VAL).over(w))

    def var(self):
        return self._roll(lambda w: _AGGS["var"](VAL).over(w))

    def median(self):
        return self._roll(lambda w: F.percentile(F.col(VAL), F.lit(0.5)).over(w))

    def quantile(self, q: float):
        return self._roll(lambda w: F.percentile(F.col(VAL), F.lit(q)).over(w))

    def skew(self):
        minp = max(self._minp, 3)
        return self._roll_guarded(lambda w: skew_expr(F.col(VAL), w), minp)

    def kurt(self):
        minp = max(self._minp, 4)
        return self._roll_guarded(lambda w: kurt_expr(F.col(VAL), w), minp)

    def _roll_guarded(self, expr_fn, minp: int) -> SparkSeries:
        out = self._eval(
            self._s._df.select(IDX, VAL),
            lambda w: [
                F.when(F.count(VAL).over(w) >= minp, expr_fn(w)).alias("__r__")
            ],
            [F.col("__r__").alias(VAL)],
        )
        return SparkSeries(out, name=self._s.name, floating=True)

    def corr(self, other: SparkSeries):
        return self._pair(other, "corr")

    def cov(self, other: SparkSeries):
        return self._pair(other, "cov")

    def _pair(self, other: SparkSeries, kind: str):
        a = self._s._df.select(IDX, F.col(VAL).alias("__l__"))
        b = other._df.select(IDX, F.col(VAL).alias("__r__"))
        j = a.join(b, IDX, "full")
        minp = self._minp

        def exprs(w):
            # pandas counts valid PAIRS toward min_periods, not left values
            guard = pair_count(F.col("__l__"), F.col("__r__"), w) >= minp
            return [F.when(guard, _pairwise("__l__", "__r__", w, kind)).alias("__v__")]

        out = self._eval(j, exprs, [F.col("__v__").alias(VAL)])
        return SparkSeries(out, floating=True)

    def apply(self, func):
        """rolling.apply via collect_list over the window + vectorized UDF
        (ref …series_rolling_functions.py:758-796 — the sanctioned slow
        path)."""

        @F.pandas_udf("double")
        def udf(arrs: pd.Series) -> pd.Series:
            return arrs.map(lambda a: float(func(np.asarray(a, dtype=float))))

        minp = self._minp
        # collect_list drops nulls; pandas hands the raw window (NaNs
        # included) to func — re-materialize nulls as NaN
        vals = F.coalesce(F.col(VAL).cast("double"), F.lit(float("nan")))
        out = self._eval(
            self._s._df.select(IDX, VAL),
            lambda w: [
                F.when(
                    F.count(VAL).over(w) >= minp, udf(F.collect_list(vals).over(w))
                ).alias("__r__")
            ],
            [F.col("__r__").alias(VAL)],
        )
        return SparkSeries(out, floating=True)


class GroupRolling:
    """df.groupby(keys).rolling(window) — per-group trailing windows.

    Groups ARE the partitioning key, so this is the natively-scalable
    rolling: one hash shuffle on the group keys, windows never cross
    groups, no context replication needed."""

    def __init__(self, frame, keys, window: int, min_periods: int | None):
        self._frame = frame
        self._keys = list(keys)
        self._w = (
            W.partitionBy(*self._keys)
            .orderBy(IDX)
            .rowsBetween(-(window - 1), 0)
        )
        self._minp = window if min_periods is None else min_periods
        self._minp_count = 0 if min_periods is None else min_periods

    def _roll_all(self, fn, guard_minp=None):
        from sdc_spark.frame.core import SparkFrame

        minp = self._minp if guard_minp is None else guard_minp
        cols = [c for c in self._frame._numeric_cols() if c not in self._keys]
        w = self._w
        exprs = [
            F.when(F.count(c).over(w) >= minp, fn(c, w)).alias(c) for c in cols
        ]
        return SparkFrame(self._frame._df.select(IDX, *self._keys, *exprs))

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

    def quantile(self, q: float):
        return self._roll_all(lambda c, w: F.percentile(F.col(c), F.lit(q)).over(w))

    def count(self):
        minp = self._minp_count
        return self._roll_all(
            lambda c, w: F.when(F.count(F.lit(1)).over(w) >= minp, F.count(c).over(w)),
            guard_minp=0,
        )

    def skew(self):
        return self._roll_all(
            lambda c, w: skew_expr(F.col(c), w), guard_minp=max(self._minp, 3)
        )

    def kurt(self):
        return self._roll_all(
            lambda c, w: kurt_expr(F.col(c), w), guard_minp=max(self._minp, 4)
        )


class FrameRolling:
    """df.rolling — all 14 reference kernels per numeric column
    (…dataframe_rolling_functions.py:86-472), incl. pairwise corr/cov
    against another frame (per matching column label) or a series (each
    column vs it)."""

    def __init__(
        self,
        frame,
        window: int,
        min_periods: int | None,
        center: bool = False,
        win_type=None,
        closed: str = "right",
    ):
        _check_win_type(win_type)
        self._frame = frame
        self._before, self._after = _bounds(window, center, closed)
        self._minp = window if min_periods is None else min_periods
        self._minp_count = 0 if min_periods is None else min_periods

    def _eval_all(self, df: DataFrame, cols, expr_fn, guard_minp: int | None):
        from sdc_spark.frame.core import SparkFrame

        c, w = _ctx_window(df, self._before, self._after)
        exprs = []
        for col in cols:
            e = expr_fn(col, w)
            if guard_minp is not None:
                e = F.when(F.count(col).over(w) >= guard_minp, e)
            exprs.append(e.alias(col))
        out = (
            c.select(IDX, F.col(sorder.CTX), *exprs)
            .filter(~F.col(sorder.CTX))
            .select(IDX, *cols)
        )
        return SparkFrame(out)

    def _roll_all(self, fn, guard: bool = True, minp: int | None = None):
        cols = self._frame._numeric_cols()
        return self._eval_all(
            self._frame._df,
            cols,
            fn,
            (minp if minp is not None else self._minp) if guard else None,
        )

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

    def count(self):
        # row-count guard, not non-null guard (see SeriesRolling.count)
        minp = self._minp_count
        return self._roll_all(
            lambda c, w: F.when(F.count(F.lit(1)).over(w) >= minp, F.count(c).over(w)),
            guard=False,
        )

    def quantile(self, q: float):
        return self._roll_all(lambda c, w: F.percentile(F.col(c), F.lit(q)).over(w))

    def skew(self):
        return self._roll_all(
            lambda c, w: skew_expr(F.col(c), w), minp=max(self._minp, 3)
        )

    def kurt(self):
        return self._roll_all(
            lambda c, w: kurt_expr(F.col(c), w), minp=max(self._minp, 4)
        )

    def apply(self, func):
        @F.pandas_udf("double")
        def udf(arrs: pd.Series) -> pd.Series:
            return arrs.map(lambda a: float(func(np.asarray(a, dtype=float))))

        minp = self._minp
        return self._roll_all(
            lambda c, w: F.when(
                F.count(c).over(w) >= minp,
                udf(
                    F.collect_list(
                        F.coalesce(F.col(c).cast("double"), F.lit(float("nan")))
                    ).over(w)
                ),
            ),
            guard=False,
        )

    def corr(self, other):
        return self._pair_all(other, "corr")

    def cov(self, other):
        return self._pair_all(other, "cov")

    def _pair_all(self, other, kind: str):
        """other: SparkFrame → pairwise per matching numeric column label;
        SparkSeries → every column against it."""
        from sdc_spark.frame.core import SparkFrame

        minp = self._minp
        if isinstance(other, SparkSeries):
            o = other._df.select(IDX, F.col(VAL).alias("__o__"))
            cols = self._frame._numeric_cols()
            j = self._frame._df.select(IDX, *cols).join(o, IDX, "full")
            pairs = {c: "__o__" for c in cols}
        elif isinstance(other, SparkFrame):
            cols = [
                c for c in self._frame._numeric_cols() if c in set(other._numeric_cols())
            ]
            o = other._df.select(IDX, *[F.col(c).alias(f"__o_{c}") for c in cols])
            j = self._frame._df.select(IDX, *cols).join(o, IDX, "full")
            pairs = {c: f"__o_{c}" for c in cols}
        else:
            raise TypeError("rolling corr/cov needs a SparkFrame or SparkSeries other")

        def expr_fn(c, w):
            oc = pairs[c]
            guard = pair_count(F.col(c), F.col(oc), w) >= minp
            return F.when(guard, _pairwise(c, oc, w, kind))

        return self._eval_all(j, list(pairs), expr_fn, None)


class GroupExpanding(GroupRolling):
    """df.groupby(keys).expanding(min_periods) — per-group prefix windows.

    Inherits every kernel from GroupRolling and only widens the frame to
    unbounded-preceding. Group-local windows mean expanding median and
    quantile are exact here by direct window recompute; the global
    SeriesExpanding reaches them through the value-bucketed
    prefix-histogram scan instead (order.scan_quantile — exact when the
    value domain has <= max_buckets distinct values)."""

    def __init__(self, frame, keys, min_periods: int = 1):
        self._frame = frame
        self._keys = list(keys)
        self._w = (
            W.partitionBy(*self._keys)
            .orderBy(IDX)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        minp = max(min_periods, 1)
        self._minp = minp
        self._minp_count = minp


class GroupEwm:
    """df.groupby(keys).ewm(...) — per-group exponentially-weighted
    kernels on the GROUPED segmented decay scan
    (operators/order.py scan_ewm_grouped): range-partition by
    (keys, __index__) so a skewed mega-group SPLITS across partitions
    (no per-group memory bound — the round-5 hash-one-group-per-batch
    path OOMed an executor on a dominant key at scale), per-partition
    cython groupby-ewm for partition-local groups, and a P-row carry
    composition for the at-most-one group straddling each boundary.
    Output shape matches the other group windows:
    (__index__, keys, numeric columns).

    alpha == 1 (memoryless, q = 0) degenerates: mean is a per-group
    forward-fill of the last valid value (one window pass, hash-partitioned
    by group), var/std are all-null (pandas returns NaN — zero effective
    history)."""

    def __init__(self, frame, keys, alpha: float, min_periods: int = 0):
        self._frame = frame
        self._keys = list(keys)
        self._alpha = alpha
        self._minp = min_periods

    def _stat(self, name: str):
        from sdc_spark.frame.core import SparkFrame
        from sdc_spark.operators import order as sorder

        cols = [c for c in self._frame._numeric_cols() if c not in self._keys]
        keys, minp = self._keys, self._minp
        src = self._frame._df.select(IDX, *keys, *cols)
        if self._alpha == 1.0:
            return self._memoryless(src, cols, name)
        out = sorder.scan_ewm_grouped(
            src, keys, [IDX], cols, self._alpha, name, min_periods=minp
        )
        return SparkFrame(out.select(IDX, *keys, *cols))

    def _memoryless(self, src, cols, name: str):
        """alpha == 1: weight is entirely on the last valid observation."""
        from sdc_spark.frame.core import SparkFrame

        cond = F.lit(True)
        for k in self._keys:
            cond = cond & F.col(k).isNotNull()
        w = (
            W.partitionBy(*self._keys)
            .orderBy(IDX)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        minp = max(self._minp, 1)
        sel = [F.col(IDX), *[F.col(k) for k in self._keys]]
        for c in cols:
            if name == "mean":
                v = F.last(F.col(c), ignorenulls=True).over(w)
                nvalid = F.count(F.col(c)).over(w)
                sel.append(F.when(nvalid >= minp, v).alias(c))
            else:  # var/std of a single-weight window: NaN (pandas)
                sel.append(F.lit(None).cast("double").alias(c))
        return SparkFrame(src.filter(cond).select(*sel))

    def mean(self):
        return self._stat("mean")

    def var(self):
        return self._stat("var")

    def std(self):
        return self._stat("std")
