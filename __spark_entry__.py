"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``canvas_data_loader_spark``; this module
is a thin adapter over its query registry (canvas_data_loader_spark/
queries.py), which pairs every declared SURVEY.md §2 operator with a
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from canvas_data_loader_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return Q.SPARK["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.SPARK)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents for every oracle-expressible query."""
    return dict(Q.ORACLE)
