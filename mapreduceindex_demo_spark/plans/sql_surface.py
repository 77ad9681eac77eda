"""SQL-text surface (SURVEY §2.6 D8, §2.2 M4): the engine accepts raw SQL
over the registered table views, with a validation/EXPLAIN entry point
mirroring the reference's /parseQuery endpoint (http_handlers.go:1462-1484)
— except here validation is Catalyst's full analyzer, not a syntax probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_tables


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the testdata views and run a SQL query against them."""
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(sql)


def validate_sql(spark: SparkSession, sf_dir: str, sql: str) -> dict:
    """Parse+analyze a query WITHOUT executing it (the /parseQuery
    contract): returns {'valid', 'error', 'plan', 'is_command'}.

    Commands (DROP/CREATE/INSERT/SET/…) are parse-checked only and never
    handed to spark.sql — Spark executes commands eagerly, so analyzing
    them would run them (a validation endpoint must not have side
    effects)."""
    load_tables(spark, sf_dir, register_views=True)
    try:
        jplan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception as e:
        return {
            "valid": False,
            "error": str(e).split("\n")[0],
            "plan": None,
            "is_command": False,
        }
    cls = jplan.getClass().getSimpleName()
    command_iface = spark._jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.Command"
    )
    looks_mutating = any(
        cls.startswith(p)
        for p in ("Drop", "Create", "Insert", "Delete", "Update", "Merge",
                  "Alter", "Truncate", "Set", "Cache", "Uncache", "Refresh")
    )
    if command_iface.isInstance(jplan) or looks_mutating:
        return {"valid": True, "error": None, "plan": cls, "is_command": True}
    try:
        df = spark.sql(sql)  # queries are lazy: analysis only
        plan = df._jdf.queryExecution().analyzed().toString()
        return {"valid": True, "error": None, "plan": plan, "is_command": False}
    except Exception as e:  # analysis errors carry the useful message
        return {
            "valid": False,
            "error": str(e).split("\n")[0],
            "plan": None,
            "is_command": False,
        }


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query(
    "sql_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    tags=("sql", "agg", "grouping-sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL entry: GROUPING SETS through spark.sql over the registered
    views — the oracle is the *same text* on DuckDB, demonstrating the
    dialect-portable SQL surface."""
    return run_sql(spark, sf_dir, _GROUPING_SETS_SQL)
