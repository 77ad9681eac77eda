"""Guard tests for the round-16 optimization internals: the bound-lambda
n-gram expressions, the batch-vectorized multimodal kernels' edge cases,
the connected-components init fold, and with_global_rank's input persist.
Each pins an optimization whose OUTPUT is already oracle-checked, so a
refactor can't silently reintroduce the measured defect."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceindex_demo_spark.functions.dedup import _ngrams_expr, shingles
from mapreduceindex_demo_spark.oracle_harness import spark_bigram_sql


def _py_ngrams(text: str, n: int) -> list:
    w = text.split(" ")
    if len(w) < n:
        return [text]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def test_ngrams_expr_binds_split_once(spark):
    """The shingle expression must keep the r16 bound-lambda form: the
    split result is bound ONCE per row (transform(array(split(...)),
    w0 -> ...)[0]), not re-evaluated per element — the O(n·|words|)
    interpreted-HOF defect measured at 11x on the sf0.1 corpus."""
    sql = str(_ngrams_expr("text", 3)._jc)
    assert "transform(array(split(" in sql.replace(" ", ""), sql
    # and the inner lambda must NOT call split again
    inner = sql.split("->", 1)[1]
    assert "split(" not in inner, sql


def test_bigram_sql_binds_split_once():
    sql = spark_bigram_sql("split(text, ' ')").replace(" ", "")
    assert sql.startswith("transform(array(split("), sql
    inner = sql.split("->", 1)[1]
    assert "split(" not in inner, sql


def test_ngrams_and_bigrams_match_python(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b"),          # shorter than n=3 -> fallback array(text)
        (3, "x"),            # single token
        (4, ""),             # empty string: split -> [''], size 1
        (5, "a  b c"),       # double space -> empty token preserved
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got3 = {r.doc_id: r.g for r in df.select("doc_id", shingles().alias("g")).collect()}
    for did, text in rows:
        assert got3[did] == _py_ngrams(text, 3), (did, got3[did])
    got2 = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", F.expr(spark_bigram_sql("split(text, ' ')")).alias("g")
        ).collect()
    }
    for did, text in rows:
        w = text.split(" ")
        want = (
            []
            if len(w) < 2
            else [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
        )
        assert got2[did] == want, (did, got2[did])


def test_ahash_vectorized_handles_empty_and_mixed_batch(spark):
    """The batch-vectorized ahash kernel must reproduce the per-image
    semantics on the edge cases the concatenation logic could break:
    empty rasters (all-zero hash), single-pixel docs, and a mixed batch
    where empties sit between non-empties (reduceat offset aliasing)."""
    from mapreduceindex_demo_spark.functions.multimodal import ahash

    rows = [(1, ""), (2, "a"), (3, ""), (4, "hello world " * 40), (5, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    got = {r.doc_id: r.ahash for r in ahash(df).collect()}
    assert got[1] == got[3] == got[5] == "0" * 16
    # per-image reference for the non-empty rows (the pre-r16 spelling)
    import numpy as np

    def ref(payload: bytes, width: int = 16) -> str:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n = arr.size
        if n == 0:
            return "0" * 16
        h = -(-n // width)
        idx = np.arange(n)
        cell = ((idx // width) * 8 // h) * 8 + (idx % width) * 8 // width
        sums = np.bincount(cell, weights=arr, minlength=64)
        cnts = np.bincount(cell, minlength=64)
        total = int(arr.sum())
        bits = (cnts > 0) & (sums.astype(np.int64) * n >= total * cnts)
        hi = sum(int(bits[k]) << (31 - k) for k in range(32))
        lo = sum(int(bits[32 + k]) << (31 - k) for k in range(32))
        return f"{hi:08X}{lo:08X}"

    for did, text in rows:
        assert got[did] == ref(text.encode("utf-8")), did


def test_resize_vectorized_checksum_on_mixed_batch(spark):
    from mapreduceindex_demo_spark.functions.multimodal import resize_media

    rows = [(1, ""), (2, "abcdefghij" * 9), (3, "xy")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    got = {r.doc_id: r for r in resize_media(df).collect()}
    import numpy as np

    for did, text in rows:
        arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        n = arr.size
        idx = np.arange(n)
        mask = ((idx // 16) % 2 == 0) & ((idx % 16) % 2 == 0)
        out = arr[mask].astype(np.int64)
        m = out.size
        chk = int((out * (np.arange(m) + 1)).sum() % 1_000_000_007) if m else 0
        r = got[did]
        assert r.n_out_pixels == m and r.out_pos_checksum == chk, did
        assert r.out_byte_sum == (int(out.sum()) if m else 0), did


def test_connected_components_init_fold_fixed_point(spark):
    """The folded label init (least(u, min(v)) in the dedup groupBy) must
    reach the same min-label fixed point as identity init: exercised on
    a path graph (needs real propagation rounds) and a two-clique
    union (the common near-dup shape, converges immediately)."""
    from mapreduceindex_demo_spark.operators.graph import connected_components

    path = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1)], ["src", "dst"]
    )
    got = {
        r.node: r.comp for r in connected_components(path, "src", "dst").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    cliques = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (20, 21)], ["src", "dst"]
    )
    got2 = {
        r.node: r.comp
        for r in connected_components(cliques, "src", "dst").collect()
    }
    assert got2 == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_with_global_rank_persists_udf_backed_input(spark):
    """with_global_rank must keep the r16 multi-reader persist: the rank
    and counts subtrees read the cached proxied frame (InMemoryTableScan
    in the executed plan) instead of re-instantiating the input twice —
    and persist_input=False must keep the cache out."""
    from mapreduceindex_demo_spark.operators.relational import with_global_rank

    df = spark.range(200).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("k")
    )
    ranked = with_global_rank(df, ["k", "id"], rank_col="r")
    rows = ranked.collect()
    assert sorted(r.r for r in rows) == list(range(1, 201))
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    spark.catalog.clearCache()
    unp = with_global_rank(df, ["k", "id"], rank_col="r", persist_input=False)
    rows2 = unp.collect()
    assert sorted(r.r for r in rows2) == list(range(1, 201))
    plan2 = unp._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan2, plan2
    # identical ranks either way (the persist is an execution detail)
    assert {(r.id, r.r) for r in rows} == {(r.id, r.r) for r in rows2}
