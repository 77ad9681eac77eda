"""Source/sink connectors (SURVEY §2.1 S9).

The reference has exactly one ingress (Couchbase DCP over protobuf) and one
egress (dataport TCP) — both cluster-private wire protocols with no
file-format surface at all. The Spark engine gets the full connector matrix
for free; this module wraps it in one uniform entry point so engine code
and tests stay format-agnostic.

Scale notes: parquet is the canonical format (columnar, predicate pushdown,
column pruning — verified in plans via PushedFilters/ReadSchema); JSON/CSV
are schema-on-read with an explicit schema to avoid an inference pass over
100 TB; `partition_by` maps to directory partitioning so downstream reads
prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "json", "csv", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Batch read. CSV defaults: header on; explicit schema recommended
    (inference costs a full extra pass at scale)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).format(fmt).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Batch write; `partition_by` creates directory partitions that
    downstream scans prune on."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-media ingest via Spark's built-in ``binaryFile`` source: one row
    per file with (path, modificationTime, length, content) — the ingest
    edge of the multimodal pipeline (images/audio/video land as opaque
    ``binary`` + typed metadata, then flow through the mapInPandas
    decode/feature stages in functions/multimodal.py).

    ``max_bytes`` filters oversized files VIA THE SOURCE (pushed length
    predicate), so giant assets are skipped at listing time, not after
    reading bytes. At 100 TB this source parallelizes by file; pack small
    assets into parquet binary columns (write_sink) for scan efficiency.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("length") <= max_bytes)
    return df
