"""Skew-aware join (100 TB posture, SURVEY 'Optimize for scale').

AQE's skew-join handles skewed *shuffle* partitions at runtime, but a
pathologically hot key inside one partition still serializes on one task.
Classic remedy: salt the skewed (large) side into N sub-keys and replicate
the small side across all N salts — turning one hot task into N parallel
tasks at the cost of replicating the other side N×.

Use when: key histogram is known-skewed (e.g. null-ish defaults, celebrity
ids) and the other side is too big to broadcast but small enough to
replicate N×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, de-skewed with `salts`
    sub-keys. Result equals `large.join(small, on, how)` for inner/left
    joins keyed on `on`."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * salts).cast("int")
    )
    salt_dim = F.explode(
        F.array(*[F.lit(i) for i in range(salts)])
    ).alias("__salt")
    salted_small = small.select("*", salt_dim)
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
