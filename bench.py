"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # unknown scale; still run and report timings
    spark = get_spark(app_name="mri-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}
    # Warm-up: run every bench query once AT THE TARGET SF so whole-stage
    # codegen/JIT is compiled, table schemas are resolved (plan cache), and
    # the OS page cache holds the parquet files before timing. Timed runs
    # then measure steady-state execution — the same warm-engine condition
    # BASELINE.md's DuckDB numbers were captured under.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", sf_dir)
    for q in bench_queries.values():
        q.fn(spark, warm_dir).count()

    # Median of 3 timed runs per query: single-run local-mode numbers swing
    # ±40% from GC/scheduler noise; the median is the steady-state figure.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        runs = []
        n = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
