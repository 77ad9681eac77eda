"""Similarity search over embedding columns (`array<float>`).

- Brute-force cosine top-k: the exact baseline. The reduction is an
  explicit *left fold in element order* (`F.aggregate` over `zip_with`)
  so the floating-point sum is bit-identical to DuckDB's `list_reduce`
  oracle — and deterministic across partitionings, because the fold is
  per-row, not a distributed aggregation.
- LSH (random-hyperplane/SimHash-for-vectors) bucketing: the scale path.
  Plane weights are a fixed integer formula of (plane, component) so any
  engine reproduces them; bucket = 8 sign bits. ANN = exact re-rank within
  the query's bucket — at 100 TB the bucket join replaces the full scan,
  turning top-k into a broadcast-join over ~1/256 of the data per probe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: LSH hyperplane count (bucket space = 2^8)
LSH_PLANES = 8


def dot_fold(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] as an in-order left fold (IEEE-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """cos(a,b) rounded; `+ 0.0` normalizes any -0.0 for hashing parity."""
    cos = dot_fold(a, b) / (F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b)))
    return F.round(cos, decimals) + F.lit(0.0)


def plane_weight_expr(j: int, dim: int = 64) -> str:
    """Deterministic pseudo-random hyperplane j as a Spark SQL array expr:
    w[i] = (((i-1)*31 + j*17) % 7) - 3  (i 1-based)."""
    return (
        f"transform(sequence(1, {dim}), "
        f"i -> CAST((((i - 1) * 31 + {j} * 17) % 7) - 3 AS DOUBLE))"
    )


def lsh_bucket(emb: Column, planes: int = LSH_PLANES, dim: int = 64) -> Column:
    """8-char '0'/'1' bucket signature from hyperplane sign bits."""
    bits = []
    for j in range(planes):
        d = dot_fold(emb, F.expr(plane_weight_expr(j, dim)))
        bits.append(F.when(d >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def assign_cells(corpus: "DataFrame", centroids: "DataFrame") -> "DataFrame":
    """Assign every corpus vector (vec_id, ee) to its nearest centroid
    (cid, ce) by cosine, tie-broken cid-ascending: one broadcast of the k
    centroid rows, a scan-local argmax per vector via a per-vec_id window.
    Returns (vec_id, ee, cid, csim)."""
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "ee", "cid", cosine(F.col("ee"), F.col("ce")).alias("csim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def recenter_cells(assigned: "DataFrame") -> "DataFrame":
    """Lloyd's re-center: per-dimension mean of each cell's members, rounded
    to the 6-dp grid (the cross-engine determinism contract — the rounding
    makes the mean order-free, see plans/llm.py:q_ivf_ann). posexplode →
    groupBy(cid, pos).avg is map-side combinable: the shuffle carries
    k × dim partial sums per task, never cell members; the re-assembly
    collect_list is over the k × dim means — bounded by the embedding
    dimension, not the data."""
    return (
        assigned.select("cid", F.posexplode("ee").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg((F.round(F.avg("v"), 6) + F.lit(0.0)).alias("cv"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("m"))
        .select("cid", F.expr("transform(m, s -> s.cv)").alias("ce"))
    )


def train_ivf_centroids(corpus: "DataFrame", k: int, iters: int) -> "DataFrame":
    """k-means-lite coarse quantizer (DataFrame-only): seed with the first
    k corpus vectors by vec_id, run `iters` Lloyd's passes. Each pass is
    one k-row broadcast + one map-side-combined (cid, pos) shuffle.
    Returns (cid, ce)."""
    # the FIRST k vectors by vec_id — not a literal [1, k] window, which
    # silently yields an EMPTY quantizer (and an empty index downstream)
    # for any corpus whose ids don't start at 1
    c = corpus.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cid"), F.col("ee").alias("ce")
    )
    for _ in range(iters):
        c = recenter_cells(assign_cells(corpus, c))
    return c


def semantic_dedup(corpus, k: int, iters: int, tau: float):
    """SemDeDup-style semantic dedup core (Abbas et al. 2023): cluster
    ``corpus`` (vec_id, ee) with the trained coarse quantizer, compare
    vectors pairwise ONLY within their cell, and report each vector
    condemned by a LOWER-id cell-mate above the cosine threshold —
    keep-lowest-id is the deterministic canonical rule. Returns
    (vec_id, cid, n_close_lower, max_sim).

    ``k`` is THE scale knob: within-cell pair cost is n²/k and join
    parallelism is k, so choose k ≈ corpus_size / target_cell_size
    (SemDeDup runs k≈10⁵ at web scale). Measured on the 10× replica
    harness: k=8 → 51.5 s, k=64 → 9.5 s on the same 20k-vector corpus
    (BASELINE.md round-6 continuation)."""
    from pyspark.sql import functions as F

    c = train_ivf_centroids(corpus, k, iters)
    assigned = assign_cells(corpus, c)
    a = assigned.select(
        "cid", F.col("vec_id").alias("va"), F.col("ee").alias("ea")
    )
    b = assigned.select("cid", "vec_id", F.col("ee").alias("eb"))
    pairs = (
        b.join(a, "cid")
        .where(F.col("va") < F.col("vec_id"))
        .withColumn("cs", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("cs") >= F.lit(tau))
    )
    return pairs.groupBy("vec_id", "cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_close_lower"),
        (F.max("cs") + F.lit(0.0)).alias("max_sim"),
    )
