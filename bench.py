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
    # Warm-up: run every bench query once at the small SF so whole-stage
    # codegen/JIT for each plan shape is compiled before timing. Timed runs
    # then measure steady-state execution (what a long-running cluster
    # sees), not one-time JVM compilation.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    for q in bench_queries.values():
        q.fn(spark, warm_dir).count()

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
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
