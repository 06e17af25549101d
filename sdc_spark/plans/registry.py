"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable that
demonstrates one operator (or one tight operator family) from SURVEY.md §2
on the driver's test tables. Each oracle is the equivalent ANSI SQL that
DuckDB runs on the same parquet files; the driver hash-compares the two at
sf0.01. Queries without an oracle get a weaker rows-only check (reserved
for genuinely non-SQL-expressible ops).

Conventions that keep the hash-compare honest:
- every computed column is aliased IDENTICALLY in Spark and SQL;
- float aggregates are rounded (ROUND(x, 4)) on BOTH sides so partition-order
  floating-point noise cannot flip the hash;
- timestamps are compared in UTC (session TZ pinned in sdc_spark.session).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        return fn

    return deco


def oracle(name: str, sql: str) -> None:
    ORACLES[name] = sql
