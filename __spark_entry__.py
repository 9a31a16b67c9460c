"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog
(see ``data_ingestion_tool_bakasura__spark/plans/``) for the driver's
DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_tool_bakasura__spark.plans.catalog import ORACLE, QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-way broadcast join + aggregation (TPC-H Q5-style
    region revenue) over sf0.001."""
    return QUERIES["q_region_revenue"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
