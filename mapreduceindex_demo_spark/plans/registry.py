"""Registry of engine queries + their DuckDB oracle SQL.

Determinism conventions (these make the driver's value-hash comparison
bit-exact between Spark and DuckDB — see tests/test_oracle_parity.py):

- **Money/rate aggregation is decimal, not double.** All testdata numerics
  are exact 2-decimal values, so ``CAST(x AS DECIMAL(12,2))`` is lossless and
  SUM over decimals is exact and order-independent in both engines. Final
  results are cast back to DOUBLE (exact conversion) so schemas line up.
- **Averages are computed as exact-decimal-sum cast to double, divided by
  count cast to double** — one IEEE double division, bit-identical anywhere.
- **Timestamps are emitted as formatted strings** (``yyyy-MM-dd`` etc.), so
  no engine-specific timestamp encoding reaches the hasher.
- **Every LIMIT/top-k has a total tiebreak order.**
- **Unavoidable double math is rounded to 6 decimals** on both sides.
- Every computed column is aliased identically on both sides (driver sorts
  columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQueryFn
    #: DuckDB-runnable ANSI SQL over views region/nation/customer/supplier/
    #: part/orders/lineitem/events/documents/embeddings. None → driver does a
    #: rows-only check (for non-SQL-expressible operators).
    oracle: str | None
    tags: tuple[str, ...] = ()
    #: include in bench.py's headline timing set
    bench: bool = False
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQueryFn], SparkQueryFn]:
    """Decorator registering a query-plan builder with its oracle."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco
