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
#: customer rows (= max c_custkey) per sf0.1 replica. VERIFIED against
#: the source parquet footer before any synthesis (r10 review lesson:
#: this constant once sat at 10x the real row count because it was
#: written from memory) — and pinned by tests/test_synth_corpus.py,
#: which fails on testdata drift. A wrong BASE silently breaks key
#: disjointness between replicas (overlapping c_custkey ranges change
#: match density), so the script refuses to run rather than synthesize
#: a subtly wrong corpus.
BASE = 15_000


def _assert_base_matches_footer() -> None:
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(os.path.join(SRC, "customer.parquet")).metadata
    if meta.num_rows != BASE:
        raise SystemExit(
            f"BASE={BASE} != {meta.num_rows} rows in {SRC}/customer.parquet"
            " — the testdata was regenerated; update BASE"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    _assert_base_matches_footer()
    out = args.out or f"/tmp/snm_corpus_x{args.copies}"
    dst = os.path.join(out, "customer.parquet")
    if os.path.exists(dst):
        # a corpus synthesized before round 12 lacks c_acctbal — detect
        # staleness from the footer instead of failing mid-benchmark
        import pyarrow.parquet as pq

        import glob as _glob

        part = sorted(_glob.glob(os.path.join(dst, "*.parquet"))) or [dst]
        names = set(pq.ParquetFile(part[0]).schema_arrow.names)
        if "c_acctbal" not in names:
            raise SystemExit(
                f"stale corpus at {dst} (no c_acctbal column — synthesized "
                "before round 12); delete it and re-run"
            )
        print(f"exists: {dst}")
        return
    spark = get_spark(app_name="synth-snm-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    # c_acctbal rides along unchanged per replica (round 12: the
    # multipass query's third pass sorts by the balance) — duplicate
    # balances across replicas are fine, the sort ties break on
    # c_custkey exactly as on the real table. Corpora synthesized
    # before round 12 lack the column; delete and re-run (the script
    # skips existing output).
    c = load_table(spark, SRC, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    rep = spark.range(args.copies).withColumnRenamed("id", "rep")
    key = (F.col("c_custkey") + F.col("rep") * BASE).alias("c_custkey")
    big = c.crossJoin(rep).select(
        key,
        F.format_string(
            "Customer#%09d", F.col("c_custkey") + F.col("rep") * BASE
        ).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
    )
    os.makedirs(out, exist_ok=True)
    big.write.parquet(dst)
    print(f"wrote {dst}: {args.copies}x = {args.copies * BASE} rows")
    spark.stop()


if __name__ == "__main__":
    main()
