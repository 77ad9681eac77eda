"""Measure the SNM offsets-join AQE safety valve on a REAL degenerate
corpus (r12 verdict item 2 — the one untested link in the round-12
safety-valve chain).

Background: `_snm_neighbor_pairs` (plans/setsim.py) ranks rows via
prefix buckets and joins a cumulative-offsets table `offs` back to the
data. The join is deliberately UN-hinted so that (a) on a healthy
corpus the planner/AQE broadcasts the |buckets|-sized metadata frame,
and (b) on a degenerate corpus — where the `_SNM_PFX`-char prefix is
near-unique and |buckets| grows ~n — AQE's ACCURATE runtime byte count
crosses the 64 MB adaptive gate (session.py) and the plan degrades to a
shuffled join instead of a driver-OOM broadcast. Round 12 machine-checked
(b) only via a thresholds-off stand-in (tests/test_setsim.py); this
script measures the real thing end to end:

1. synthesize a degenerate twin of the r10 synth corpus: same keys,
   same 25-nation blocking skew, but names spelled '%09d#Customer' so
   the leading 16 chars contain all 9 key digits — every row its own
   prefix bucket, |buckets| == n (15M at the default --copies 1000,
   hundreds of shuffle-MB for `offs`, far past the 64 MB gate);
2. run [q:er_sorted_neighborhood] on it and inspect the FINAL adaptive
   plan: the offsets join (keys [c_nationkey, bkt]) must have demoted
   to SortMergeJoin/ShuffledHashJoin — no forced driver-side build;
3. verify the output against the naive single-window-per-block oracle
   (DuckDB over the same parquet) — the demoted plan must return the
   exact answer.

Prints one JSON line (plan verdict, row parity, forced timing). Run it
EXCLUSIVELY (no co-running Spark) like every bench script.

Usage: python scripts/degenerate_snm_probe.py [--copies 1000] [--reps 1]
Idempotent on the corpus: re-uses /tmp/snm_degenerate_x{copies}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceindex_demo_spark.oracle_harness import spark_forced_expr  # noqa: E402
from mapreduceindex_demo_spark.session import get_spark, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
#: rows per replica — must match the source footer (synth_snm_corpus rule)
BASE = 15_000

#: join-node regex over the FINAL adaptive plan: the offsets join is the
#: only join keyed on the bucket column, so a SortMergeJoin/
#: ShuffledHashJoin carrying `bkt` in its keys IS the demoted offsets
#: join, and a BroadcastHashJoin carrying it is the forced-build failure
#: mode this probe exists to rule out.
_DEMOTED = re.compile(r"(?:SortMergeJoin|ShuffledHashJoin)[^\n]*\bbkt#\d+")
_BROADCAST = re.compile(r"BroadcastHashJoin[^\n]*\bbkt#\d+")


def synthesize(spark, copies: int) -> str:
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(os.path.join(SRC, "customer.parquet")).metadata
    if meta.num_rows != BASE:
        raise SystemExit(
            f"BASE={BASE} != {meta.num_rows} rows in {SRC}/customer.parquet"
        )
    out = f"/tmp/snm_degenerate_x{copies}"
    dst = os.path.join(out, "customer.parquet")
    if os.path.exists(dst):
        # a killed prior run leaves a partial directory (e.g. _temporary/
        # still present, or fewer rows than expected) — validate before
        # trusting it, mirroring the SRC row-count check above
        try:
            import pyarrow.dataset as ds

            have = ds.dataset(dst, format="parquet").count_rows()
        except Exception:
            have = -1
        if have == copies * BASE and not os.path.exists(
            os.path.join(dst, "_temporary")
        ):
            print(f"# corpus exists: {dst} ({have} rows)", file=sys.stderr)
            return out
        print(
            f"# stale/partial corpus at {dst} ({have} rows, want "
            f"{copies * BASE}) — regenerating",
            file=sys.stderr,
        )
        shutil.rmtree(dst)
    c = load_table(spark, SRC, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    rep = spark.range(copies).withColumnRenamed("id", "rep")
    key = (F.col("c_custkey") + F.col("rep") * BASE).alias("c_custkey")
    big = c.crossJoin(rep).select(
        key,
        # the degeneracy: digits FIRST, so the 16-char rank-bucket prefix
        # is unique per row and |buckets| == n
        F.format_string(
            "%09d#Customer", F.col("c_custkey") + F.col("rep") * BASE
        ).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
    )
    os.makedirs(out, exist_ok=True)
    big.write.parquet(dst)
    print(f"# wrote {dst}: {copies}x = {copies * BASE} rows", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="degenerate-snm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    data = synthesize(spark, args.copies)

    from mapreduceindex_demo_spark.plans import QUERIES

    q = QUERIES["er_sorted_neighborhood"]
    force = spark_forced_expr(q.fn(spark, data).columns)
    timings = []
    fdf = None
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fdf = q.fn(spark, data).selectExpr(force)
        fdf.collect()
        timings.append(round(time.perf_counter() - t0, 2))
    # read the runtime plan from the EXECUTED DataFrame (the forced one
    # that was collected) — a fresh/un-executed frame only carries the
    # static pre-AQE plan, whose join choice is an ESTIMATE; the claim
    # this probe exists to measure is what AQE actually ran
    final_plan = (
        fdf._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    aqe_final = "isFinalPlan=true" in final_plan
    demoted = bool(_DEMOTED.search(final_plan))
    forced_broadcast = bool(_BROADCAST.search(final_plan))

    rows = sorted(tuple(r) for r in q.fn(spark, data).collect())

    oracle_match = None
    oracle_sec = None
    if not args.skip_oracle:
        import duckdb

        con = duckdb.connect()
        path = os.path.join(data, "customer.parquet")
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{path}')"
        )
        t0 = time.perf_counter()
        exp = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
        oracle_sec = round(time.perf_counter() - t0, 2)
        oracle_match = rows == exp

    print(
        json.dumps(
            {
                "corpus": data,
                "rows": args.copies * BASE,
                "plan_is_aqe_final": aqe_final,
                "offsets_join_demoted_to_shuffle": demoted,
                "offsets_join_broadcast": forced_broadcast,
                "result_rows": len(rows),
                "oracle_match": oracle_match,
                "spark_forced_sec": timings,
                "duckdb_naive_sec": oracle_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
