"""Bucketed (co-located) tables — the shuffle-elimination path for the
suite's one unavoidable big-big join (orders ⋈ lineitem on orderkey; see
PLANS.md "Where the shuffles are").

Hash-bucketing both join sides on the key at write time is the managed-
deployment answer the reference approximates with its fixed vbucket
hash-partitioning (SURVEY §1.1 Vbucket, projector.go:20-126): data is
pre-placed by key once, and every subsequent co-keyed join or aggregation
reads it back with `Exchange`-free plans. At 100 TB this converts the
recurring per-query shuffle of the fact table into a one-time write cost.

Spark specifics encoded here:
- `bucketBy` requires `saveAsTable` (a catalog table, not a bare path).
- Both sides must have the SAME bucket count for the shuffle to vanish
  (AQE leaves bucketed scans alone).
- `sortBy` within buckets additionally removes the per-task Sort of the
  sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet catalog table hash-bucketed on
    `bucket_cols` (optionally sorted within buckets)."""
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed the physical plan has NO Exchange — each task reads
    bucket i of both tables (verified by tests/test_bucketing.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
