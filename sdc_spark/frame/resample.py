"""FrameResampler / SeriesResampler — the pandas ``obj.resample(rule)``
downsampling surface over the timeseries operator.

Pandas semantics honored:
- buckets are rule-aligned (floor to the bucket start);
- EMPTY buckets inside [min, max] appear in the result (count -> 0, other
  aggregates -> null) — implemented by generating the dense bucket axis
  with ``F.sequence`` (a tiny one-row driver-free expression, exploded and
  re-distributed) and left-joining the per-bucket aggregate onto it;
- the bucket start becomes the index.

Scale: the aggregate is one map-side-combined hash shuffle; the dense axis
has one row per bucket (time span / rule — independent of data volume) and
is broadcast onto the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sdc_spark.operators.timeseries import _UNIT_SECONDS, bucket_expr, parse_rule

_CAL_INTERVAL = {"m": "1 month", "me": "1 month", "month": "1 month",
                 "y": "1 year", "ye": "1 year", "year": "1 year"}


def _dense_axis(bucketed: DataFrame, bucket_col: str, rule: str) -> DataFrame:
    """One row per rule-sized step between min and max observed bucket."""
    mult, unit = parse_rule(rule)
    if unit in _CAL_INTERVAL:
        step = F.expr(f"interval {_CAL_INTERVAL[unit]}")
    else:
        step = F.expr(f"interval {mult * _UNIT_SECONDS[unit]} seconds")
    bounds = bucketed.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    return (
        bounds.select(F.explode(F.sequence("lo", "hi", step)).alias(bucket_col))
        # sequence() materializes on one row; repartition so a huge span
        # (e.g. second-granularity over years) doesn't sit on one task
        .repartition(bucket_col)
    )


class Resampler:
    """Shared downsampling core; ``_frame``/``_series``/``_group`` wrappers
    choose the boxing of the result."""

    _KINDS = ("sum", "mean", "min", "max", "count", "median", "std", "var",
              "first", "last")

    def __init__(
        self,
        df: DataFrame,
        ts_col: str,
        rule: str,
        value_cols: list[str],
        keys: list[str] | None = None,
    ):
        self._df = df
        self._ts = ts_col
        self._rule = rule
        self._cols = value_cols
        self._keys = list(keys or [])

    def _axis(self, agg: DataFrame, b: str) -> DataFrame:
        if not self._keys:
            return _dense_axis(agg, b, self._rule)
        # per-group dense axis (pandas groupby().resample() densifies
        # inside each group's own [min, max]): bounds per key -> exploded
        # sequence. One row per (group, bucket) — span-bounded, not
        # data-bounded.
        mult, unit = parse_rule(self._rule)
        if unit in _CAL_INTERVAL:
            step = F.expr(f"interval {_CAL_INTERVAL[unit]}")
        else:
            step = F.expr(f"interval {mult * _UNIT_SECONDS[unit]} seconds")
        bounds = agg.groupBy(*self._keys).agg(
            F.min(b).alias("lo"), F.max(b).alias("hi")
        )
        return bounds.select(
            *self._keys, F.explode(F.sequence("lo", "hi", step)).alias(b)
        )

    def _agg(self, kind: str) -> DataFrame:
        if kind not in self._KINDS:
            raise ValueError(f"unsupported resample aggregate {kind!r}")
        from sdc_spark.operators.timeseries import _agg_col

        b = "__bucket__"
        order = F.col(self._ts)
        bucketed = self._df.select(
            *self._keys,
            bucket_expr(F.col(self._ts), self._rule).alias(b),
            self._ts,
            *self._cols,
        )
        agg = bucketed.groupBy(*self._keys, b).agg(
            *[_agg_col(kind, c, self._ts, order).alias(c) for c in self._cols]
        )
        axis = self._axis(agg, b)
        join_keys = [*self._keys, b]
        out = axis.join(F.broadcast(agg), join_keys, "left")
        if kind in ("count", "sum"):
            # pandas: empty buckets count to 0 and sum to 0.0 (min_count=0)
            out = out.select(
                *join_keys,
                *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in self._cols],
            )
        return out

    def sum(self):
        return self._box(self._agg("sum"))

    def mean(self):
        return self._box(self._agg("mean"))

    def min(self):
        return self._box(self._agg("min"))

    def max(self):
        return self._box(self._agg("max"))

    def count(self):
        return self._box(self._agg("count"))

    def median(self):
        return self._box(self._agg("median"))

    def std(self):
        return self._box(self._agg("std"))

    def var(self):
        return self._box(self._agg("var"))

    def first(self):
        return self._box(self._agg("first"))

    def last(self):
        return self._box(self._agg("last"))


class FrameResampler(Resampler):
    """``df.resample(rule, on=ts_col)`` — aggregates every numeric column."""

    def _box(self, out: DataFrame):
        from sdc_spark.frame.core import SparkFrame
        from sdc_spark.frame.series import IDX

        return SparkFrame(out.withColumnRenamed("__bucket__", IDX))

    def ohlc(self, column: str):
        """open/high/low/close for one column (pandas
        ``resample(rule)[col].ohlc()``), dense over empty buckets."""
        from sdc_spark.frame.core import SparkFrame
        from sdc_spark.frame.series import IDX
        from sdc_spark.operators.timeseries import ohlc as _ohlc

        b = "__bucket__"
        bars = _ohlc(self._df, self._ts, column, self._rule).withColumnRenamed(
            "bucket", b
        )
        axis = _dense_axis(bars, b, self._rule)
        bars = (
            axis.join(F.broadcast(bars), b, "left")
            .withColumn("volume", F.coalesce("volume", F.lit(0)))
            .withColumnRenamed(b, IDX)
        )
        return SparkFrame(bars)


class SeriesResampler(Resampler):
    """``series.resample(rule)`` over a datetime index."""

    def _box(self, out: DataFrame):
        from sdc_spark.frame.series import IDX, VAL, SparkSeries

        return SparkSeries(
            out.select(F.col("__bucket__").alias(IDX), F.col(self._cols[0]).alias(VAL))
        )


class GroupResampler(Resampler):
    """``df.groupby(keys).resample(rule, on=ts)`` — per-group bars with
    per-group dense axes; group keys stay as columns."""

    def _box(self, out: DataFrame):
        from sdc_spark.frame.core import SparkFrame
        from sdc_spark.frame.series import IDX

        return SparkFrame(out.withColumnRenamed("__bucket__", IDX))
