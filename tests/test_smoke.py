from __future__ import annotations

import importlib
import sys

from tests.conftest import SMOKE_SF_DIR

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SMOKE_SF_DIR)
        assert df.count() >= 0, name


def test_load_table_events_on_driver_like_session(spark):
    """r1 regression: the correctness driver passes its OWN SparkSession,
    without get_spark()'s nanosAsLong conf — load_table must survive the
    TIMESTAMP(NANOS) events.parquet regardless of who built the session."""
    from mapreduceindex_demo_spark.session import clear_table_cache, load_table

    clear_table_cache()  # force a real read — cached plans would mask the bug
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, SMOKE_SF_DIR, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
