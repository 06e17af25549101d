"""Headline analytical plans + the driver-facing query/oracle registry."""

from sdc_spark.plans.registry import ORACLES, QUERIES, oracle, query  # noqa: F401
