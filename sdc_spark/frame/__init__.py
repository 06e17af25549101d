"""Pandas-like facade over Spark DataFrames (SURVEY.md §7 design stance).

``SparkFrame``/``SparkSeries`` mirror the reference's user-visible pandas
subset (the @overload surface of IntelPython/sdc) on top of the expression
layer in sdc_spark.functions. The index convention: an explicit
``__index__`` column carried through every op (SURVEY §1.4) — alignment is
a full outer join on it; ops state whether they preserve or reset it.
"""

from sdc_spark.frame.core import (  # noqa: F401
    SparkFrame,
    concat,
    from_pandas,
    merge,
    read_parquet,
)
from sdc_spark.frame.series import SparkSeries  # noqa: F401
from sdc_spark.functions.conversion import (  # noqa: F401
    to_datetime,
    to_numeric,
)
