"""Expression builders with pandas edge semantics (SURVEY.md §2.9)."""

from sdc_spark.functions import dt, expressions, strings  # noqa: F401
