"""Scale-out curve datapoint: ONE (query, cpu-count, data-dir) forced
timing in a fresh JVM — the single-machine proxy for executor-slot
scale-out (BASELINE.md rounds 8-9). Run once per combination so every
measurement gets its own JVM:

    python scripts/scaleout_curve.py <cpus> <query> <data_dir> [reps=3]

Prints one JSON line with the per-rep forced timings and the median.
Spark-only: the curve compares Spark against itself at 8 vs 32 slots;
the DuckDB comparison lives in scripts/bench_sf1.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus, name, data = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from mapreduceindex_demo_spark.plans import QUERIES
    from mapreduceindex_demo_spark.session import get_spark

    spark = get_spark(app_name=f"scaleout-{name}-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    q = QUERIES[name]
    cols = q.fn(spark, data).columns
    force = (
        "bit_xor(xxhash64("
        + ", ".join(f"cast(`{c}` as string)" for c in cols)
        + ")) as checksum"
    )
    q.fn(spark, data).selectExpr(force).collect()  # warm (JIT + page cache)
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        q.fn(spark, data).selectExpr(force).collect()
        runs.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "query": name,
                "cpus": int(cpus),
                "data": data,
                "runs": runs,
                "median": sorted(runs)[len(runs) // 2],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
