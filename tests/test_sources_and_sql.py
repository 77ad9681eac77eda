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


def test_compaction_rebalances_small_files(spark, tmp_path):
    """64 tiny files → compacted to the planned count, content-identical;
    sorted variant produces range-clustered files (per-file disjoint
    key ranges → parquet min/max stats prune row groups)."""
    import glob

    from pyspark.sql import functions as F

    from mapreduceindex_demo_spark.sources.compaction import (
        compact_parquet,
        plan_file_count,
    )

    events = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    n = events.count()
    frag = str(tmp_path / "frag")
    events.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    target = max(1, n // 4)
    n_files = compact_parquet(spark, frag, dst, target_rows_per_file=target)
    assert n_files == plan_file_count(n, target)
    assert len(glob.glob(f"{dst}/part-*.parquet")) == n_files
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, events.collect())
    )

    dst2 = str(tmp_path / "clustered")
    compact_parquet(
        spark, frag, dst2, target_rows_per_file=target, sort_cols=["event_id"]
    )
    # disjoint per-file event_id ranges = the row-group pruning guarantee
    ranges = []
    for f in sorted(glob.glob(f"{dst2}/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            F.min("event_id"), F.max("event_id")
        ).collect()[0]
        ranges.append((pdf[0], pdf[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    assert sorted(map(tuple, spark.read.parquet(dst2).collect())) == sorted(
        map(tuple, events.collect())
    )


def test_binary_file_ingest(spark, tmp_path):
    """Multimodal ingest edge: binaryFile source reads raw assets as
    (path, modificationTime, length, content), glob-filtered and
    size-gated; bytes round-trip exactly and flow into the parquet
    binary-column layout the multimodal stages consume."""
    from mapreduceindex_demo_spark.sources.readers import (
        read_binary_files,
        write_sink,
    )

    payloads = {f"img_{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    (tmp_path / "skip.txt").write_bytes(b"not media")
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == payloads
    assert dict(df.dtypes)["content"] == "binary"

    small = read_binary_files(spark, str(tmp_path), glob="*.bin", max_bytes=12)
    assert small.count() == 3  # 10, 11, 12 byte files pass the gate

    # ingest → parquet binary-column layout (what the pipeline scans)
    out = str(tmp_path / "packed")
    write_sink(df.select("path", "length", "content"), out)
    packed = spark.read.parquet(out)
    assert packed.count() == 5
    assert dict(packed.dtypes)["content"] == "binary"
