"""Datetime field access (SURVEY.md §2.9 datetime).

Reference: Timestamp attribute extraction
/root/reference/sdc/hiframes/pd_timestamp_ext.py:120-160 (year…nanosecond,
.date()) and the DatetimeIndex attrs exercised by
sdc/tests/test_date.py:50-200. Spark timestamps are µs so ``nanosecond`` is
always the µs remainder × 1000 — documented truncation (SURVEY §1.2).

pandas numbering conventions reproduced where Spark differs:
- dayofweek: Monday=0 (Spark's dayofweek is Sunday=1 → use weekday())
- quarter/dayofyear/weekofyear as in pandas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


year = lambda x: F.year(_c(x))  # noqa: E731
month = lambda x: F.month(_c(x))  # noqa: E731
day = lambda x: F.dayofmonth(_c(x))  # noqa: E731
hour = lambda x: F.hour(_c(x))  # noqa: E731
minute = lambda x: F.minute(_c(x))  # noqa: E731
second = lambda x: F.second(_c(x)).cast("int")  # noqa: E731
quarter = lambda x: F.quarter(_c(x))  # noqa: E731
dayofyear = lambda x: F.dayofyear(_c(x))  # noqa: E731


def microsecond(x) -> Column:
    # cast: unix_micros rejects TIMESTAMP_NTZ; the fractional part is
    # unaffected by the (UTC) session-zone interpretation of the cast
    return (F.unix_micros(_c(x).cast("timestamp")) % 1_000_000).cast("int")


def dayofweek(x) -> Column:
    """pandas: Monday=0..Sunday=6 (Spark weekday() matches exactly)."""
    return F.weekday(_c(x))


def date(x) -> Column:
    return F.to_date(_c(x))


def is_month_start(x) -> Column:
    return F.dayofmonth(_c(x)) == 1


def is_month_end(x) -> Column:
    return F.to_date(_c(x)) == F.last_day(_c(x))


def days_between(a, b) -> Column:
    """(a - b).dt.days."""
    return F.datediff(F.to_date(_c(a)), F.to_date(_c(b)))
