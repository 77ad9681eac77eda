"""Z-order (Morton-curve) data layout: cluster a table on MULTIPLE columns
so min/max footer stats prune scans on ANY of them.

A table sorted by one column prunes beautifully on that column and not at
all on the others; a multi-dimensional workload (the lakehouse norm — "this
part AND this supplier", "this date AND this key range") needs every filter
column to be *locally* clustered. Interleaving the bits of the
rank-normalized dimensions gives a space-filling curve: rows close on the
curve are close in every dimension, so each written file (and each parquet
row group inside it — files are written z-sorted) covers a small box of the
space, and the engine's ordinary footer-stats pruning becomes effective on
all clustered columns at once.

This is a WRITE-side layout operator, like sources/bucketing.py and the
durable index's key-sorted buckets: at 100 TB you re-cluster once per
compaction cycle and every subsequent multi-dimensional scan pays only for
the boxes it touches. Everything here is plain JVM expressions (bit ops,
one 1-row broadcast of the per-column ranges) — no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; d dimensions use d*BITS bits of the long z-value
DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value: bit i of column j lands at position i*d + j. Inputs
    must already be non-negative ints < 2**bits (see :func:`zvalue`).
    Expands to d*bits shift/mask/or terms — all whole-stage-codegen."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits exceeds a signed long")
    # force LONG lanes: Spark's shiftleft on an INT column masks the shift
    # count mod 32, so an int input at bit position >= 31 would sign-flip
    # (2 dims x 16 bits) or wrap entirely (3 dims) before reaching the
    # accumulator
    longs = [c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(longs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zvalue(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Append a ``__z`` column: each dimension is range-normalized to
    [0, 2**bits) against its table-wide min/max (computed as ONE map-side
    combined aggregate row and broadcast — never collected), then
    bit-interleaved."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    ranges = df.agg(*aggs)
    scale = (1 << bits) - 1
    out = df.crossJoin(F.broadcast(ranges))
    scaled = []
    for c in cols:
        lo = F.col(f"__min_{c}").cast("double")
        hi = F.col(f"__max_{c}").cast("double")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled.append(
            F.floor((F.col(c).cast("double") - lo) * F.lit(scale) / span).cast(
                "long"
            )
        )
    return out.withColumn("__z", interleave_bits(scaled, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = DEFAULT_BITS,
) -> None:
    """Re-cluster ``df`` along the z-curve of ``cols`` and write parquet:
    range-partition by ``__z`` (contiguous curve segments per file — one
    sampling pass + one shuffle), sort within each task (task-local, no
    extra exchange) so row groups inside every file bracket disjoint curve
    ranges, and drop the helper column from the stored schema."""
    z = zvalue(df, cols, bits)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
