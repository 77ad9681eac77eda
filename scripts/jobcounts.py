"""Per-bench-query Spark job/stage census — the instrument for attacking
the fixed per-query constant (each job is a driver→scheduler round-trip;
DuckDB pays none). Runs every bench query once warm inside a job group and
reports how many jobs and stages the single action launched.

Usage: python scripts/jobcounts.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="mri-jobcounts")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    bench = {n: q for n, q in QUERIES.items() if q.bench}
    for q in bench.values():  # warm: schemas resolved, codegen compiled
        q.fn(spark, sf_dir).count()

    print(f"{'query':32s} {'jobs':>4s} {'stages':>6s} {'tasks':>6s}")
    for name, q in bench.items():
        sc.setJobGroup(name, name)
        q.fn(spark, sf_dir).count()
        sc.setJobGroup("", "")
        jobs = tracker.getJobIdsForGroup(name)
        stages = set()
        tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                stages.update(info.stageIds)
        for s in stages:
            si = tracker.getStageInfo(s)
            if si:
                tasks += si.numTasks
        print(f"{name:32s} {len(jobs):4d} {len(stages):6d} {tasks:6d}")
    spark.stop()


if __name__ == "__main__":
    main()
