"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (multi-way star join +
aggregation; fixed dims broadcast, scaling tables AQE-planned) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the
engine's workload registry
(``etl_neotel_sql_automation_spark/workload/``): one entry per
implemented operator from SURVEY.md §2 plus the LLM-data-pipeline ops,
each paired with the DuckDB oracle SQL the driver hash-compares at
sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_neotel_sql_automation_spark import workload

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.queries()["flagship_region_revenue"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
