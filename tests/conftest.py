from __future__ import annotations

import os
from contextlib import contextmanager

import duckdb
import pytest

from mapreduceindex_demo_spark.session import TABLE_NAMES, get_spark, table_path

#: driver's correctness gate runs at sf0.01 — tests mirror it by default
PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mri-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views under
    the same names the driver uses."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(PARITY_SF_DIR, name)}')"
        )
    yield con
    con.close()


@contextmanager
def no_broadcast(spark):
    """Disable BOTH broadcast thresholds (the static file-size estimate
    AND the session's 64 MB adaptive runtime gate — session.py sets them
    separately) and drop cached plans compiled under them, so a fallback
    test really re-plans without broadcast — the degenerate-corpus
    stand-in. Restores both and clears the cache again on exit. Shared
    by the SNM-offsets and ahash-apply valve tests; any join whose
    broadcast is a PLANNER choice (never an F.broadcast hint, the
    round-12 rule) must survive this context with identical results and
    no BroadcastHashJoin in its final plan."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        spark.catalog.clearCache()
