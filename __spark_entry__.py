"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``game_data_etl_pipeline_spark.registry``: every operator
from SURVEY.md §2 registers there once with both its PySpark
implementation and (where SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from game_data_etl_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by region, 5-table star join) on sf0.001."""
    from game_data_etl_pipeline_spark.operators.relational import q_revenue_by_region

    return q_revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every registered query is
    oracled (engine-specific ops via self-validating audits)."""
    return registry.oracle_sql()
