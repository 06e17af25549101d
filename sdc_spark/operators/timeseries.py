"""Time-series resampling (downsampling) — the pandas ``df.resample(rule)``
surface, re-expressed as a bucket-key groupBy.

The reference engine's time-series story is rolling/asof windows over sorted
frames (/root/reference/sdc/datatypes/hpat_pandas_series_rolling_functions.py,
sdc/datatypes/sdc_function_templates.py merge_asof); pandas users pair those
with ``resample`` for bar aggregation (OHLC and friends). Spark-first design:

- the bucket key is a pure JVM expression (``date_trunc`` for calendar units,
  integer floor-division on ``unix_micros`` for arbitrary multiples like
  ``15min``), so bucketing rides inside whole-stage codegen and the groupBy
  is one partial+final hash aggregation — map-side combine means the shuffle
  carries one row per (group, bucket), not per event;
- open/close are ``min_by``/``max_by`` on the event timestamp — no sort, no
  window, still a single aggregation pass (correct when timestamps are
  unique within a bucket; ties broken by a (ts, tiebreak) struct when a
  tiebreak column is given);
- at 100 TB nothing here funnels: the only shuffle is the hash partition on
  (group keys, bucket), and bucket count grows with the time span, not the
  row count.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pandas offset alias -> (seconds, date_trunc unit for multiple==1)
_UNIT_SECONDS = {
    "s": 1,
    "sec": 1,
    "second": 1,
    "min": 60,
    "t": 60,
    "minute": 60,
    "h": 3600,
    "hour": 3600,
    "d": 86400,
    "day": 86400,
    "w": 604800,
    "week": 604800,
}
_TRUNC_UNIT = {
    "s": "second",
    "sec": "second",
    "second": "second",
    "min": "minute",
    "t": "minute",
    "minute": "minute",
    "h": "hour",
    "hour": "hour",
    "d": "day",
    "day": "day",
    "w": "week",
    "week": "week",
    "m": "month",
    "me": "month",
    "month": "month",
    "y": "year",
    "ye": "year",
    "year": "year",
}

_RULE_RE = re.compile(r"^\s*(\d*)\s*([a-zA-Z]+)\s*$")


def parse_rule(rule: str) -> tuple[int, str]:
    """Parse a pandas offset alias like ``'15min'`` / ``'H'`` / ``'1D'``
    into ``(multiple, unit)``. Raises on units we can't bucket exactly."""
    m = _RULE_RE.match(rule)
    if not m:
        raise ValueError(f"unsupported resample rule {rule!r}")
    mult = int(m.group(1) or "1")
    unit = m.group(2).lower()
    if unit not in _TRUNC_UNIT:
        raise ValueError(f"unsupported resample unit {unit!r} in {rule!r}")
    if unit in ("m", "me", "month", "y", "ye", "year") and mult != 1:
        # month/year multiples need calendar arithmetic, not fixed seconds
        raise ValueError(f"only multiple=1 supported for calendar unit {unit!r}")
    return mult, unit


def bucket_expr(ts: Column, rule: str) -> Column:
    """Timestamp -> bucket-start timestamp for the given rule, as a pure
    JVM expression (codegen-friendly; no UDF, no window)."""
    mult, unit = parse_rule(rule)
    if mult == 1:
        return F.date_trunc(_TRUNC_UNIT[unit], ts)
    step_us = mult * _UNIT_SECONDS[unit] * 1_000_000
    us = F.unix_micros(ts.cast("timestamp"))
    # integer floor toward -inf via pmod (Spark's % truncates toward zero,
    # which would round PRE-1970 timestamps to the wrong, later bucket);
    # stays integral end-to-end (no double rounding at 2^53)
    return F.timestamp_micros((us - F.pmod(us, F.lit(step_us))).cast("long"))


_SIMPLE_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "median": F.median,
    "std": F.stddev_samp,
    "var": F.var_samp,
}


def _agg_col(kind: str, col: str, ts_col: str, order: Column) -> Column:
    if kind in _SIMPLE_AGGS:
        return _SIMPLE_AGGS[kind](col)
    if kind in ("first", "open"):
        return F.min_by(col, order)
    if kind in ("last", "close"):
        return F.max_by(col, order)
    raise ValueError(f"unsupported resample aggregate {kind!r}")


def resample_agg(
    df: DataFrame,
    ts_col: str,
    rule: str,
    aggs: dict[str, tuple[str, str]],
    by: list[str] | None = None,
    tiebreak: str | None = None,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Downsample ``df`` into ``rule``-sized time buckets.

    ``aggs`` maps output column name -> (agg kind, input column); kinds are
    sum/mean/min/max/count/median/std/var/first/last (open==first,
    close==last, both resolved by event time). ``by`` adds group keys so one
    pass produces per-key bars. One hash shuffle total.
    """
    order = F.col(ts_col)
    if tiebreak is not None:
        order = F.struct(F.col(ts_col), F.col(tiebreak))
    keys = list(by or [])
    out = df.groupBy(
        *keys, bucket_expr(F.col(ts_col), rule).alias(bucket_name)
    ).agg(
        *[
            _agg_col(kind, col, ts_col, order).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    return out


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    rule: str,
    by: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Classic bar aggregation: open/high/low/close + volume(count) per
    bucket (pandas ``resample(rule)[col].ohlc()``)."""
    return resample_agg(
        df,
        ts_col,
        rule,
        {
            "open": ("open", value_col),
            "high": ("max", value_col),
            "low": ("min", value_col),
            "close": ("close", value_col),
            "volume": ("count", value_col),
        },
        by=by,
        tiebreak=tiebreak,
    )
