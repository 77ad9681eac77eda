"""Synthesize a LARGE customer table for the SNM scale-out curve.

The ~sf1/~sf3 replica harness (scripts/bench_sf1.py) scales the FACT
tables; customer is a dimension (15k rows at sf0.1), so even x30 leaves
[q:er_sorted_neighborhood] job-constant-bound (450k rows, 3 length-18
levenshteins per row — microseconds of per-task work under seconds of
fixed cost) and a slot curve measures scheduler overhead, not the
operator. This writes an N-times customer with globally distinct keys
and names (same 'Customer#%09d' shape, so match density and the 25-value
blocking-key skew — the straggler scenario the distributed rewrite
targets — are preserved), big enough that the w-window comparisons are
real work.

Usage: python scripts/synth_snm_corpus.py [--copies 1000] [--out DIR]
Idempotent: skipped when the output file already exists.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceindex_demo_spark.session import get_spark, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
BASE = 15_000  # customer rows (= max c_custkey) per sf0.1 replica


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/snm_corpus_x{args.copies}"
    dst = os.path.join(out, "customer.parquet")
    if os.path.exists(dst):
        print(f"exists: {dst}")
        return
    spark = get_spark(app_name="synth-snm-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    c = load_table(spark, SRC, "customer").select("c_custkey", "c_nationkey")
    rep = spark.range(args.copies).withColumnRenamed("id", "rep")
    key = (F.col("c_custkey") + F.col("rep") * BASE).alias("c_custkey")
    big = c.crossJoin(rep).select(
        key,
        F.format_string(
            "Customer#%09d", F.col("c_custkey") + F.col("rep") * BASE
        ).alias("c_name"),
        "c_nationkey",
    )
    os.makedirs(out, exist_ok=True)
    big.write.parquet(dst)
    print(f"wrote {dst}: {args.copies}x = {args.copies * BASE} rows")
    spark.stop()


if __name__ == "__main__":
    main()
