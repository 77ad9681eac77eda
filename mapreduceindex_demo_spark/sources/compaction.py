"""Small-file compaction — the table-maintenance pass every long-lived
100 TB deployment needs.

Incremental pipelines (streaming foreachBatch MERGE, per-batch CDC
appends, hourly ingests) accumulate many small files; at scale, scan cost
becomes dominated by per-file open/footer overhead and driver-side file
listing, not bytes. The reference never faces this (its index storage is
the upstream indexer's LSM), but any parquet-backed deployment of THIS
engine does. Compaction rewrites a directory into ~target-sized files:

- file count is computed from the actual row count (one cheap count job —
  parquet metadata-only), not guessed;
- `repartition(n)` round-robins rows for even file sizes — a full shuffle
  by design, which is exactly what rebalancing requires;
- with `sort_cols`, uses `repartitionByRange(...).sortWithinPartitions`
  instead, producing range-clustered files whose parquet min/max column
  stats enable scan-time row-group pruning on those columns (the poor
  man's clustering index).

Write-then-swap is the caller's concern (object stores rename
atomically per-prefix differently); this utility writes to a NEW
directory and never mutates the source.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_file_count(n_rows: int, target_rows_per_file: int) -> int:
    return max(1, math.ceil(n_rows / max(1, target_rows_per_file)))


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``src_dir`` parquet into ``dst_dir`` with ~evenly sized
    files; returns the file count written."""
    df: DataFrame = spark.read.parquet(src_dir)
    n_files = plan_file_count(df.count(), target_rows_per_file)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("error").parquet(dst_dir)
    return n_files
