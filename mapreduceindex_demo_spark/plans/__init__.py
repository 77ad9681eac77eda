"""Query-plan layer: the engine's declared query suite.

Each query is a named pair (Spark DataFrame plan builder, DuckDB oracle SQL)
registered in :mod:`.registry`. The driver's correctness gate runs both sides
at sf0.01 and compares row-count + schema + order-insensitive value hash.
"""

from mapreduceindex_demo_spark.plans.registry import QUERIES, Query, query  # noqa: F401

# Importing the suite modules populates QUERIES.
from mapreduceindex_demo_spark.plans import relational  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import mapindex_queries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import llm  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import streaming_queries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import sql_surface  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import subqueries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import tpch_more  # noqa: F401,E402
