"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``mapreduceindex_demo_spark.plans`` — each registry
entry carries both the Spark plan builder and its DuckDB oracle SQL, so
the two can never drift apart silently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduceindex_demo_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return QUERIES["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    without an oracle get the driver's rows-only check."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
