"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Analysis-C-analog query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``markt_database_analyzer_spark.catalog`` (one entry per implemented
operator family from SURVEY.md §2, each with a DuckDB oracle unless the
operator is not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from markt_database_analyzer_spark.catalog import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Analysis-C-analog HAVING threshold scales with the data: sf0.001
    has only ~6 customers per nation, so the smoke run uses >= 5.
    """
    return REGISTRY["c_gain_by_nation"].fn(spark, "/root/testdata/sf0.001", min_customers=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted where the operator
    is not SQL-expressible; the driver then records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
