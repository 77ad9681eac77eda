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
    # Warm the JVM + parquet footer caches once with the cheapest query so
    # per-query numbers measure the plan, not JVM startup.
    next(iter(bench_queries.values())).fn(spark, sf_dir).count()

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
