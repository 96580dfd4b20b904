"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(data_pipeline_foundations_spark.registry): every implemented operator from
SURVEY.md §2 registers a (Spark callable, DuckDB oracle SQL) pair there;
this module exposes them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_foundations_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "pl01_settlement_pipeline"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_queries().items()
            if spec.oracle is not None}
