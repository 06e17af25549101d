"""Trailing row-count rolling windows with pandas ``min_periods`` semantics.

Reference: series/df ``.rolling(window, min_periods)`` —
/root/reference/sdc/datatypes/hpat_pandas_rolling_types.py:36-117 and the
kernel set in hpat_pandas_series_rolling_functions.py:106-1140
(sum, mean, count, var, std, min, max, median, quantile, skew, kurt,
corr, cov, apply). The reference's incremental pop/put kernels are a
single-threaded optimization; on Spark the same semantics are one window
spec evaluated by the native WindowExec — partitioned, spill-aware, no
Python in the loop.

Semantics reproduced:
- trailing window of ``window`` rows: rowsBetween(-(window-1), 0);
- result is NULL until at least ``min_periods`` non-null values are in
  the frame (pandas counts non-null, not rows) — expressed as a
  ``count(col) over w >= min_periods`` guard;
- ddof=1 for var/std (sample), matching pandas defaults.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def rolling_window(
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    window: int = 1,
) -> WindowSpec:
    w = W.partitionBy(*partition_by) if partition_by else W.partitionBy()
    return w.orderBy(*order_by).rowsBetween(-(window - 1), 0)


def _guard(col: str | Column, w: WindowSpec, min_periods: int, expr: Column) -> Column:
    if min_periods <= 0:
        return expr
    return F.when(F.count(col).over(w) >= min_periods, expr)


def _pairwise(col: str | Column, other: str | Column, w: WindowSpec, kind: str) -> Column:
    """Windowed Pearson corr / sample covariance from co-moment sums.

    Spark's native corr/covar window aggregates raise DIVIDE_BY_ZERO under
    ANSI mode when a frame holds <2 rows (the window is evaluated for every
    row before any CASE guard applies), so we build them from sum/count —
    try_divide yields NULL on degenerate frames, matching pandas/DuckDB.
    Only rows where BOTH values are non-null participate (pandas pairwise
    semantics).

    Numerics: the caller pre-centers both columns on their global means
    (rolling_agg), so the co-moment sums here are over deviations — this
    kills the catastrophic cancellation the raw two-pass formula suffers on
    large-magnitude data and keeps us bit-comparable with single-pass
    (Welford) engines after rounding."""
    x, y = F.col(col) if isinstance(col, str) else col, F.col(other) if isinstance(other, str) else other
    both = x.isNotNull() & y.isNotNull()
    xv = F.when(both, x)
    yv = F.when(both, y)
    n = F.count(xv).over(w).cast("double")
    sx = F.sum(xv).over(w)
    sy = F.sum(yv).over(w)
    sxy = F.sum(xv * yv).over(w)
    if kind == "cov":
        return F.try_divide(sxy - sx * sy / n, n - 1)
    sxx = F.sum(xv * xv).over(w)
    syy = F.sum(yv * yv).over(w)
    return F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )


def skew_expr(x: Column, w: WindowSpec) -> Column:
    """pandas sample-adjusted rolling skew G1 = sqrt(n(n-1))/(n-2) · g1
    from raw power sums (Spark's skewness() is population g1; reference
    formula sdc/functions/statistics.py:32-40 is the pandas one)."""
    n = F.count(x).over(w).cast("double")
    m = F.avg(x).over(w)
    ex2 = F.avg(x * x).over(w)
    ex3 = F.avg(x * x * x).over(w)
    m2 = ex2 - m * m
    m3 = ex3 - 3 * m * ex2 + 2 * m * m * m
    g1 = F.try_divide(m3, F.pow(m2, 1.5))
    return g1 * F.try_divide(F.sqrt(n * (n - 1)), n - 2)


def kurt_expr(x: Column, w: WindowSpec) -> Column:
    """pandas sample excess kurtosis from power sums:
    ((n+1)·g2 + 6) · (n−1)/((n−2)(n−3)) with g2 = m4/m2² − 3."""
    n = F.count(x).over(w).cast("double")
    m = F.avg(x).over(w)
    ex2 = F.avg(x * x).over(w)
    ex3 = F.avg(x * x * x).over(w)
    ex4 = F.avg(x * x * x * x).over(w)
    m2 = ex2 - m * m
    m4 = ex4 - 4 * m * ex3 + 6 * m * m * ex2 - 3 * m * m * m * m
    g2 = F.try_divide(m4, m2 * m2) - 3
    return F.try_divide((n + 1) * g2 + 6, (n - 2) * (n - 3)) * (n - 1)


def pair_count(x: Column, y: Column, w: WindowSpec) -> Column:
    """Count of valid PAIRS in the frame — what pandas weighs against
    min_periods for rolling corr/cov."""
    return F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).over(w)


_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    # F.median rejects window frames; exact percentile(0.5) is frame-capable
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "skew": F.skewness,
    "kurt": F.kurtosis,
}


def scaled_long(col: str | Column, decimals: int) -> Column:
    """Exact integer encoding of a decimal-quantized column: x·10^d as long.

    Parquet test data carries fixed-decimal values (prices: 2 decimals,
    quantities: integers); x*10^d suffers float error so we round before the
    cast. Downstream co-moment sums over these longs are EXACT in both Spark
    and any SQL oracle → cross-engine bit-identical statistics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**decimals), 0).cast("long")


def exact_var_std(
    x_long: Column, w: WindowSpec, scale: int, ddof: int = 1
) -> tuple[Column, Column]:
    """Sample variance/stddev over a window from integer co-moments:
    var = (n·Σx² − (Σx)²) / (n·(n−ddof)) / scale². All products stay in
    long (exact) until the final double division — the same arithmetic an
    oracle engine performs on the same integers, so results match bitwise."""
    n = F.count(x_long).over(w)
    sx = F.sum(x_long).over(w)
    sxx = F.sum(x_long * x_long).over(w)
    num = (n * sxx - sx * sx).cast("double")
    var = F.try_divide(num, (n * (n - ddof)).cast("double")) / float(scale) ** 2
    return var, F.sqrt(var)


def exact_cov_corr(
    x_long: Column, y_long: Column, w: WindowSpec, scale_x: int, scale_y: int
) -> tuple[Column, Column]:
    """Pairwise sample covariance + Pearson corr from integer co-moments
    (same cross-engine-exact scheme as exact_var_std)."""
    n = F.count(x_long).over(w)
    sx = F.sum(x_long).over(w)
    sy = F.sum(y_long).over(w)
    sxy = F.sum(x_long * y_long).over(w)
    sxx = F.sum(x_long * x_long).over(w)
    syy = F.sum(y_long * y_long).over(w)
    num = (n * sxy - sx * sy).cast("double")
    cov = F.try_divide(num, (n * (n - 1)).cast("double")) / float(scale_x * scale_y)
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt((n * syy - sy * sy).cast("double"))
    corr = F.try_divide(num, den)
    return cov, corr


def rolling_agg(
    df: DataFrame,
    col: str,
    aggs: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    window: int = 1,
    min_periods: int = 1,
    quantile: float = 0.5,
    other: str | None = None,
) -> DataFrame:
    """Append ``{agg}_{col}`` rolling columns. ``other`` is the second column
    for corr/cov (pairwise kernels, ref rolling corr/cov overloads)."""
    w = rolling_window(order_by, partition_by, window)
    out = df
    centered = False
    if any(a in ("corr", "cov") for a in aggs):
        # Pre-center on global means (shift-invariant for corr/cov): one
        # scalar aggregate broadcast to every partition — O(1) network.
        centers = df.agg(
            F.avg(col).alias("__cx__"), F.avg(other).alias("__cy__")
        )
        out = out.crossJoin(F.broadcast(centers))
        centered = True
    for agg in aggs:
        name = f"{agg}_{col}"
        if agg in _AGGS:
            expr = _AGGS[agg](col).over(w)
        elif agg == "quantile":
            expr = F.percentile(col, F.lit(quantile)).over(w)
            name = f"quantile_{col}"
        elif agg in ("corr", "cov"):
            expr = _pairwise(
                F.col(col) - F.col("__cx__"), F.col(other) - F.col("__cy__"), w, agg
            )
        else:
            raise ValueError(f"unsupported rolling agg {agg!r}")
        if agg == "count":
            # pandas rolling.count has min_periods=0 flavor: count of non-null
            out = out.withColumn(name, F.count(col).over(w))
        elif agg in ("corr", "cov"):
            # pandas guards corr/cov on valid PAIRS, not left-column values
            if min_periods > 0:
                out = out.withColumn(
                    name,
                    F.when(pair_count(F.col(col), F.col(other), w) >= min_periods, expr),
                )
            else:
                out = out.withColumn(name, expr)
        else:
            out = out.withColumn(name, _guard(col, w, min_periods, expr))
    if centered:
        out = out.drop("__cx__", "__cy__")
    return out
