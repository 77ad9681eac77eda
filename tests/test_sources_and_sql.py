"""Connector round-trips (S9) and the SQL validation surface (D8)."""

from __future__ import annotations

import pytest

from mapreduceindex_demo_spark.plans.sql_surface import validate_sql
from mapreduceindex_demo_spark.session import load_table
from mapreduceindex_demo_spark.sources import read_source, write_sink
from tests.conftest import SMOKE_SF_DIR


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    """events → write fmt → read fmt == original (CSV/JSON via explicit
    schema — no inference pass)."""
    src = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    path = str(tmp_path / fmt)
    write_sink(src, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    """partition_by produces directory partitions a filtered read prunes."""
    src = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "part")
    write_sink(src, path, partition_by=["event_type"])
    one = read_source(spark, path).where("event_type = 'click'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == src.where("event_type = 'click'").count()
    # partition filter visible in the scan, not a post-filter
    assert "PartitionFilters" in plan or "event_type" in plan


def test_bad_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, str(tmp_path), fmt="avro")


def test_validate_sql(spark):
    ok = validate_sql(spark, SMOKE_SF_DIR, "SELECT count(*) AS c FROM lineitem")
    assert ok["valid"] and ok["plan"] and not ok["is_command"]
    bad = validate_sql(spark, SMOKE_SF_DIR, "SELECT no_such_col FROM lineitem")
    assert not bad["valid"]
    assert "no_such_col" in bad["error"] or "UNRESOLVED" in bad["error"]
    syntax = validate_sql(spark, SMOKE_SF_DIR, "SELEC broken")
    assert not syntax["valid"]


def test_validate_sql_does_not_execute_commands(spark):
    """A validation endpoint must be side-effect free: DROP TABLE is
    parse-checked but never run (spark.sql executes commands eagerly)."""
    r = validate_sql(spark, SMOKE_SF_DIR, "DROP TABLE lineitem")
    assert r["valid"] and r["is_command"]
    # the view survived:
    assert spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c > 0
    r2 = validate_sql(spark, SMOKE_SF_DIR, "INSERT INTO lineitem VALUES (1)")
    assert r2["is_command"]
