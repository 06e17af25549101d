"""Composite distributed operators built from DataFrame primitives."""

from sdc_spark.operators.asof import merge_asof  # noqa: F401
from sdc_spark.operators.rolling import rolling_agg  # noqa: F401
