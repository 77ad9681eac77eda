"""Mirror of the driver's correctness gate: every registered query with an
oracle is run on Spark AND DuckDB at sf0.01; row count, column names, and
(order-insensitively) every value must match exactly.

Exact value equality is intentional — the query suite is engineered for
bit-exact cross-engine determinism (decimal aggregation, string-formatted
timestamps, 6-decimal rounding policy; see plans/registry.py). A failure
here is a real portability bug that the driver's hash compare would flag.
"""

from __future__ import annotations

import math

import pytest

from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


#: DuckDB types with no Spark/Arrow equivalent: the driver's value hasher
#: encodes them differently from the Spark column even when every value is
#: equal (r03 postmortem: SUM over int/window promotes to HUGEINT=int128
#: while Spark emits BIGINT — rows bit-identical, hash red). Python ints
#: erase the distinction, so value comparison alone can't catch it; the
#: oracle's *declared* schema must be clean.
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_schema_has_no_unhashable_types(duck, name):
    """Cheap schema-only check (DESCRIBE doesn't execute the query): no
    oracle may project a HUGEINT/UHUGEINT/DECIMAL column — cast aggregates
    to BIGINT/DOUBLE per the suite convention (plans/registry.py)."""
    q = QUERIES[name]
    rows = duck.execute(f"DESCRIBE ({q.oracle})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(t in typ.upper() for t in FORBIDDEN_DUCK_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle projects driver-unhashable DuckDB types {bad}; "
        f"wrap the expression in CAST(... AS BIGINT/DOUBLE)"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, PARITY_SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_sorted = _rows_to_sorted(spark_rows, spark_cols)
    d_sorted = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_sorted)} rows differ; first 3: "
        f"{mismatches[:3]} (columns sorted: {sorted(spark_cols)})"
    )
