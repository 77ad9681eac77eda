"""SparkSession factory and testdata loading.

Scale posture: configs below are chosen so the same code runs on a
1000-executor cluster — AQE handles post-shuffle partition sizing and skew,
broadcast threshold keeps star-schema dims (region/nation/customer at any
realistic size) on the broadcast path, and the session timezone is pinned to
UTC so timestamp semantics are deterministic across engines/JVMs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: the ten driver-provided tables (TESTDATA.md)
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "mapreduceindex-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[N] for tests/bench; on a real cluster the master/resource flags
    come from spark-submit and everything here still applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        # At 100 TB we'd raise shuffle.partitions into the thousands and let
        # AQE coalesce; the skew-join config is what survives hot keys.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast policy, split by estimate quality: the STATIC threshold
        # (compressed-FILE-size estimates, systematically low) stays at
        # Spark's conservative default — the r1 setting of 64 MB was
        # measured this round broadcasting the ORDERS fact table in four
        # TPC-H shapes at ~sf3, a hashed relation growing linearly with
        # data (the anti-plan at 100 TB, where only region/nation and
        # filtered/aggregated smalls are broadcastable). The ADAPTIVE
        # threshold is the generous one: AQE decides from ACCURATE
        # post-shuffle byte counts, so a 64 MB allowance there recovers
        # every small-at-runtime broadcast without ever hashing a fact
        # table on a bad guess. Measured at ~sf3: 2-3× faster on the
        # misestimated shapes, same plans at 100× because runtime sizes
        # grow past the gate exactly when broadcasting stops being safe.
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        # Let AQE (partition coalescing, runtime sizing) apply INSIDE
        # cached plans too — off, a .persist() freezes its subtree at the
        # static shuffle.partitions fan-out, inflating task counts for the
        # domain-sized grids the curation/CDC paths cache.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        # Deterministic timestamp semantics (match DuckDB's naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects; read
        # as long and convert in load_table (µs truncation == what DuckDB's
        # µs TIMESTAMP does on the same file, keeping oracle parity).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_col_max(path: str, col: str):
    """Max of a column from parquet FOOTER statistics only — no Spark job,
    no data read; handles single-file and directory-of-part-files layouts.
    This is how CDC-style consumers should learn offsets/boundaries: from
    source metadata, never by scanning the data."""
    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    hi = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns) if md.schema.column(i).name == col
        )
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is not None and st.max is not None:
                hi = st.max if hi is None else max(hi, st.max)
    return hi


#: resolved-plan cache: (spark appId, sf_dir, table) → DataFrame. A cached
#: DataFrame is only the *logical plan* (scan + events ts conversion) — data
#: is still read per action, so this is a metadata cache, not a data cache.
#: Keyed by applicationId so a stopped/rebuilt session never reuses plans.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan → Catalyst gets filter
    pushdown + column pruning on it for free.

    Repeated loads of the same table return the cached resolved plan:
    ``spark.read.parquet`` costs a file listing + footer schema read each
    call (~0.1-0.3 s of pure driver latency), which at 100 TB is exactly the
    catalog's job to amortize. Testdata is immutable, so the cached plan
    never goes stale.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS,false), which Spark rejects
        # outright unless read as long. The conf is runtime-settable and
        # idempotent, and must be set HERE (not only in get_spark()) because
        # callers — including the correctness driver — may hand us a
        # SparkSession this package did not build.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong read: convert epoch-nanos → µs-precision timestamp
        # with integer division (ns values exceed 2^53 — no float math).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        # Parquet TIMESTAMP(isAdjustedToUTC=false) is inferred as
        # TIMESTAMP_NTZ by Spark 4, which rejects instant functions
        # (unix_micros, to_utc_timestamp, …). The session timezone is
        # pinned to UTC (get_spark), so casting NTZ→LTZ keeps the exact
        # wall-clock values DuckDB sees in its naive TIMESTAMP — a pure
        # type reinterpretation, no data movement, stays in the scan
        # projection (column pruning/pushdown unaffected).
        from pyspark.sql import functions as F

        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all testdata tables; optionally register them as temp views so
    ``spark.sql`` works against the same names the DuckDB oracle uses."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
