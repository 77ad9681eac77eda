"""Per-query DuckDB comparator for the headline bench suite.

The r7 verdict's adjudication cost: BENCH artifacts carry per-query Spark
timings, but the committed DuckDB comparator was a suite TOTAL — so a
contention artifact on one query (nation_market_share_yearly, r7) needed a
judge re-run to adjudicate. This script produces the per-query DuckDB
split on the SAME testdata bench.py reads, with the same symmetric forced
methodology (checksum aggregate over every output column — full
materialization, no result transfer; one definition shared with
bench_sf1.py via mapreduceindex_demo_spark.oracle_harness), so disputes
self-adjudicate.

Usage: python scripts/duck_suite.py [--sf-dir /root/testdata/sf0.1]
Prints a markdown table + one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceindex_demo_spark.oracle_harness import (  # noqa: E402
    duck_connect,
    duck_forced_sql,
)
from mapreduceindex_demo_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    # 5 reps with a min/median split (r10 verdict item 7): the committed
    # r10 DuckDB legacy total (1.33 s) was a fast outlier against the
    # 1.6-2.3 s band later sessions measured — reporting BOTH the median
    # (the comparable headline) and the min (the variance floor) makes a
    # lucky run self-identifying instead of a judge re-run.
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    con = duck_connect(args.sf_dir)
    bench = {n: q for n, q in QUERIES.items() if q.bench and q.oracle}

    rows, timings, mins = [], {}, {}
    for name, q in bench.items():
        forced = duck_forced_sql(con, q.oracle)
        con.execute(forced).fetchall()  # warm
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            con.execute(forced).fetchall()
            runs.append(time.perf_counter() - t0)
        med = round(sorted(runs)[len(runs) // 2], 4)
        timings[name] = med
        mins[name] = round(min(runs), 4)
        rows.append((name, med, mins[name]))
        print(
            f"# {name}: duckdb forced median {med:.4f}s"
            f" min {mins[name]:.4f}s",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    total_min = round(sum(mins.values()), 4)
    print("| query | duckdb forced median (s) | min (s) |")
    print("|---|---|---|")
    for name, med, mn in sorted(rows, key=lambda r: -r[1]):
        print(f"| {name} | {med:.3f} | {mn:.3f} |")
    print(f"| **total** | **{total:.3f}** | **{total_min:.3f}** |")
    # mirror bench.py's frozen legacy split so the symmetric suite pair
    # stays comparable across the r10 bench-set refresh (loud on a
    # renamed/un-benched legacy query, same as bench.py)
    from bench import _LEGACY_15

    print(
        json.dumps(
            {
                "metric": "duckdb_headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": mins,
                "legacy_total": round(
                    sum(timings[k] for k in _LEGACY_15), 4
                ),
                "legacy_total_min": round(
                    sum(mins[k] for k in _LEGACY_15), 4
                ),
                "total_min": total_min,
                "reps": args.reps,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
