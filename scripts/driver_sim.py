"""Exact simulation of the external correctness driver.

Builds a BARE SparkSession (none of the engine's get_spark confs — the
r1 failure mode), registers the DuckDB views, and runs the first
``--limit`` registered queries (the driver checks exactly 50) with the
driver's own comparison: column names sorted, row count, and
order-insensitive normalized value equality.

Usage: python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--limit 50]
Exit code 0 iff every checked query is green.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from mapreduceindex_demo_spark.session import TABLE_NAMES, table_path  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _sorted_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(
        out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to check instead of the first "
        "--limit registered (targeted re-verification after a change)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for n in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM "
            f"read_parquet('{table_path(args.sf, n)}')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    if args.only:
        picked = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in picked if n not in qs]
        if unknown:
            print(f"unknown query names: {unknown}", file=sys.stderr)
            return 1
    else:
        picked = list(qs)[: args.limit]
        print(len(E.entry(spark).collect()), "rows from entry()", file=sys.stderr)
    bad = []
    for name in picked:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows)", file=sys.stderr)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _sorted_rows(srows, scols) == _sorted_rows(drows, dcols)
            )
            if not ok:
                bad.append(name)
                print(
                    f"{name}: MISMATCH spark={len(srows)} duck={len(drows)}",
                    file=sys.stderr,
                )
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            # drop the completed query's helper caches (persisted LM /
            # fingerprint-index frames the lazy return contract cannot
            # unpersist itself): over a 200+-query suite run the
            # leftovers accumulate executor memory pressure (r14 ADVICE)
            spark.catalog.clearCache()
    n = len(picked)
    print(f"driver sim: {n - len(bad)}/{n} green; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
