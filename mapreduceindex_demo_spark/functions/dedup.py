"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every variant is a groupBy/join on a *derived small key*
(hash, band bucket, blocking key) — never an unblocked all-pairs compare.
- exact: one shuffle on md5(text).
- MinHash+LSH: shingles → fixed-width signature → band buckets →
  candidate pairs only where a band collides (the classic
  Broder/Leskovec-Rajaraman-Ullman construction). All hashing is md5-based
  and string-ordered so the DuckDB oracle can reproduce it bit-for-bit.
- SimHash: 16-bit majority signature over token hashes; one explode +
  groupBy per doc (Charikar's scheme, integer-only arithmetic).
- n-gram Jaccard: exact verification, blocked by a grouping key (lang
  here); at 100 TB the block key is the LSH bucket, keeping pair counts
  near-linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: MinHash parameters: 8 hash functions, 4 bands × 2 rows
MINHASH_FUNCS = 8
MINHASH_BANDS = 4


def _ngrams_expr(col: str, n: int) -> Column:
    """Word n-gram shingles as array<string> (JVM-side; the size guard
    matters — Spark's sequence(1, k) runs *backwards* when k < 1).

    The split array is BOUND ONCE per row as a lambda variable (r16,
    guide §1.2 per-task work): higher-order functions are interpreted
    (no whole-stage codegen) and do NOT hoist loop-invariant
    subexpressions, so the previous spelling re-ran ``split(col, ' ')``
    for every element_at of every n-gram — O(n·|words|) full splits per
    row. ``transform(array(split(...)), w -> ...)[0]`` evaluates the
    split exactly once and the inner lambda reads the bound array.
    Measured on the sf0.1 corpus explode (noop sink): 3.24 s → 0.28 s,
    output byte-identical."""
    parts = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    return F.expr(
        f"transform(array(split({col}, ' ')), w -> "
        f"CASE WHEN size(w) < {n} THEN array({col}) "
        f"ELSE transform(sequence(1, size(w) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) END)[0]"
    )


def shingles(col: str = "text", n: int = 3) -> Column:
    return _ngrams_expr(col, n)


def minhash_signature(col: str = "text", n: int = 3, funcs: int = MINHASH_FUNCS) -> list[Column]:
    """MinHash: h_j = min over shingles of md5(j || '|' || shingle).

    Hex md5 strings are fixed-width, so lexicographic MIN == numeric MIN of
    the 128-bit hash — portable across Spark and DuckDB with zero numeric
    conversion."""
    g = shingles(col, n)

    def hasher(j: int):
        prefix = f"{j}|"
        # single-arg lambda is required: F.transform passes (element, index)
        # to two-arg lambdas, which would silently rebind j to the index
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return [
        F.array_min(F.transform(g, hasher(j))).alias(f"mh_{j}")
        for j in range(funcs)
    ]


def minhash_signature_table(
    df: DataFrame,
    *key_cols: str,
    col: str = "text",
    n: int = 3,
    funcs: int = MINHASH_FUNCS,
) -> DataFrame:
    """MinHash signatures as an aggregation over EXPLODED shingles —
    bit-identical values to :func:`minhash_signature`, restructured for
    the engine. Two problems with the projection form: higher-order
    lambdas (transform/array_min) evaluate as interpreted expression
    trees, and Catalyst's CollapseProject inlines the whole signature
    into any downstream Generate/Filter, re-evaluating O(shingles) work
    per reference (measured: 24 s to force 5k docs' signatures at sf0.1
    vs 6.9 s this way — BASELINE.md round 6). Exploding shingles to rows
    makes the md5 a codegen'd row expression evaluated exactly once per
    (shingle, hash), and the per-doc MIN is a partial aggregate — the
    exchange carries |docs| × funcs values (map-side combine), never the
    shingles. The aggregation is also an optimizer barrier: downstream
    band expressions see plain attributes, not the signature tree."""
    # explode_outer, not explode: a NULL text yields a NULL shingle array,
    # and the projection form keeps that row (all-NULL signature) — a plain
    # explode would silently DROP it, breaking the bit-identical contract
    ex = df.select(
        *key_cols, F.explode_outer(shingles(col, n)).alias("__shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("__shingle")))).alias(f"mh_{j}")
        for j in range(funcs)
    ]
    return ex.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


#: affine-derivation parameters for the CPU-scale MinHash family:
#: h_j(s) = (A[j]·H(s) + B[j]) mod P with H(s) = first 8 md5 hex chars as
#: an integer. A[j] odd and < 2^30 keeps A·H < 2^62 (no BIGINT overflow
#: for H < 2^32); P is the Mersenne prime 2^31−1.
_AFFINE_P = 2_147_483_647
_AFFINE_A = [15485863, 32452843, 49979687, 67867967,
             86028121, 104395301, 122949823, 141650939,
             160481183, 179424673, 198491317, 217645177,
             236887691, 256203161, 275604541, 295075147]
_AFFINE_B = [(j * 7919 + 104729) % _AFFINE_P for j in range(16)]


def minhash_signature_table_affine(
    df: DataFrame,
    *key_cols: str,
    col: str = "text",
    n: int = 3,
    funcs: int = MINHASH_FUNCS,
) -> DataFrame:
    """The CPU-SCALE MinHash family: ONE strong hash per shingle
    (md5 head as a 32-bit integer) plus ``funcs`` affine derivations
    h_j = (A_j·H + B_j) mod P — 1/funcs-th the md5 work of the portable
    scheme in :func:`minhash_signature_table`, with the identical
    explode/partial-aggregate plan shape. Affine maps over a prime
    modulus are the classic universal-hash MinHash construction, so the
    component-match fraction remains an unbiased Jaccard estimator
    (quality property-tested in tests/test_llm_functions.py).

    NOT oracle-mirrored: the committed query suite keeps the portable
    md5-per-(j, shingle) scheme so every DuckDB oracle reproduces
    signatures bit-for-bit. Measured honestly (BASELINE.md round 6):
    in THIS engine the end-to-end gain is only ~1.2× (2.45 → 2.05 s
    forced at ~sf1) — the hash work falls ``funcs``-fold but the
    explode + aggregate machinery dominates the pipeline cost here; the
    family pays off on engines/datasets where hashing itself dominates
    (long documents, wide signatures, vectorized hash kernels)."""
    if funcs > len(_AFFINE_A):
        raise ValueError(f"funcs > {len(_AFFINE_A)} affine parameter sets")
    # explode_outer for row-preservation parity with the portable sibling:
    # a NULL text aggregates to an all-NULL signature instead of silently
    # dropping the document from the signature table.
    ex = df.select(*key_cols, F.explode_outer(shingles(col, n)).alias("__shingle"))
    h = F.conv(F.substring(F.md5("__shingle"), 1, 8), 16, 10).cast("bigint")
    ex = ex.select(*key_cols, h.alias("__h"))
    aggs = [
        F.min(
            (F.col("__h") * F.lit(_AFFINE_A[j]) + F.lit(_AFFINE_B[j]))
            % F.lit(_AFFINE_P)
        ).alias(f"mh_{j}")
        for j in range(funcs)
    ]
    return ex.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def minhash_bands(sig_cols: list[str], bands: int = MINHASH_BANDS) -> list[Column]:
    """Band hashes: md5 of the concatenated rows of each band (b rows per
    band). Equal band hash ⇒ LSH candidate pair.

    NULL-propagating: an all-NULL signature (a NULL-text document,
    preserved deliberately by minhash_signature_table) yields NULL band
    hashes, so NULL-text docs never become candidate pairs with each
    other. A bare concat_ws would skip the NULLs and hash every such doc
    to md5('') — a universal bucket the DuckDB oracles (which compute
    ``mh_0 || '|' || mh_1`` = NULL and emit no pairs) do not have."""
    rows_per_band = len(sig_cols) // bands
    out = []
    for b in range(bands):
        cols = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        out.append(
            F.when(
                F.col(cols[0]).isNotNull(),
                F.md5(F.concat_ws("|", *cols)),
            ).alias(f"band_{b}")
        )
    return out


def simhash16(doc_id: str, text_col: str, df: DataFrame) -> DataFrame:
    """16-bit SimHash per document: per-token value from the first 4 hex
    nibbles of md5(token); each bit is the sign of the ±1 vote sum.
    Integer-only arithmetic → bit-identical in any engine."""
    hexpos = "instr('0123456789abcdef', substring(md5(tok), {p}, 1)) - 1"
    wv = " + ".join(
        f"({hexpos.format(p=p + 1)}) * {16 ** (3 - p)}" for p in range(4)
    )
    toks = df.select(doc_id, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    toks = toks.withColumn("wv", F.expr(wv).cast("bigint"))
    votes = [
        F.sum(
            F.when((F.col("wv").bitwiseAND(1 << j)) != 0, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(16)
    ]
    agg = toks.groupBy(doc_id).agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v_{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else (sim + bit)
    return agg.select(doc_id, sim.cast("bigint").alias("simhash"))


def jaccard(a_grams: Column, b_grams: Column) -> Column:
    """Exact Jaccard over distinct shingle sets, one double divide."""
    ga, gb = F.array_distinct(a_grams), F.array_distinct(b_grams)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(ga).cast("double") + F.size(gb).cast("double") - inter
    return F.round(inter / union, 6)
