"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_finance_spark.registry` — the single source of
truth for the declared query surface. Every entry in ``queries()`` has
been verified locally against its ``oracle_sql()`` via the differential
harness (etl_finance_spark/testing.py) before being declared here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_finance_spark import registry
from etl_finance_spark.plans.flagship import pct_change_hourly_rollup


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-user lag-1 percent change over events (the reference's signature
    computation, /root/reference/etl.py:166-170) rolled into an hourly
    tumbling aggregate per event type.
    """
    return pct_change_hourly_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every EXACT/ROUND query; WEAK
    (non-SQL-expressible) queries are omitted on purpose."""
    return registry.oracle_sql()
