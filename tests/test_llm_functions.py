"""Unit tests for the LLM-pipeline function library (the non-oracle paths:
multimodal decode plumbing; sanity of dedup/similarity helpers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.functions import multimodal as MM
from mapreduceindex_demo_spark.functions import similarity as S
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import SMOKE_SF_DIR


def test_decode_features_mapinpandas(spark):
    """Arrow-batched decode: schema, one row per doc, stats match the
    source bytes, deterministic across runs."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    feats = MM.decode_features(docs)
    assert feats.columns == [
        "doc_id", "codec", "width", "height", "n_pixels", "byte_sum",
        "min_byte", "max_byte", "mean_byte",
    ]
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = {row.doc_id: row for row in rows}
    one = docs.select("doc_id", "text").first()
    raw = one.text.encode()
    got = r[one.doc_id]
    assert got.codec == "gray8"
    assert got.n_pixels == len(raw)
    assert got.byte_sum == sum(raw)
    assert got.min_byte == min(raw) and got.max_byte == max(raw)
    assert got.height == -(-len(raw) // MM.MEDIA_WIDTH)
    # run twice → identical (determinism)
    rows2 = MM.decode_features(docs).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_media_container_roundtrip(spark):
    """JVM-side container assembly parses back exactly with the Python
    decoder: header fields and pixel bytes survive the round trip."""
    df = spark.createDataFrame([(1, "Héllo wörld")], "doc_id long, text string")
    blob = df.select(MM.media_container().alias("m")).first().m
    codec, width, px = MM.decode_media(bytes(blob))
    assert codec == "gray8" and width == MM.MEDIA_WIDTH
    assert bytes(px) == "Héllo wörld".encode()


def test_decode_media_rejects_corrupt_containers():
    good = MM._HEADER.pack(MM.MEDIA_MAGIC, 1, 16, 3) + b"abc"
    assert bytes(MM.decode_media(good)[2]) == b"abc"
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_media(good[:5])
    with pytest.raises(ValueError, match="bad media magic"):
        MM.decode_media(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="unknown codec id"):
        MM.decode_media(MM._HEADER.pack(MM.MEDIA_MAGIC, 9, 16, 3) + b"abc")
    with pytest.raises(ValueError, match="!= declared"):
        MM.decode_media(MM._HEADER.pack(MM.MEDIA_MAGIC, 1, 16, 5) + b"abc")


def test_lsh_bucket_shape(spark):
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("ee")
    )
    buckets = emb.select(S.lsh_bucket(F.col("ee")).alias("b")).collect()
    assert all(len(r.b) == 8 and set(r.b) <= {"0", "1"} for r in buckets)
    # buckets actually spread the data (not all-identical signatures)
    assert len({r.b for r in buckets}) > 1


def test_cosine_self_is_one(spark):
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("ee")
    )
    vals = emb.select(S.cosine(F.col("ee"), F.col("ee")).alias("c")).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in vals)


def test_connected_components_match_union_find(spark):
    """The distributed label-propagation clusters must equal a driver-side
    union-find ground truth over the same LSH pair list."""
    from mapreduceindex_demo_spark.operators.graph import connected_components
    from mapreduceindex_demo_spark.plans import QUERIES

    pairs_df = QUERIES["dedup_minhash_lsh_pairs"].fn(spark, SMOKE_SF_DIR)
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    assert len(pairs) > 0

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {n: find(n) for n in parent}

    got = {
        r.node: r.comp
        for r in connected_components(pairs_df, "doc_a", "doc_b").collect()
    }
    assert got == expected

    sizes = {}
    for comp in expected.values():
        sizes[comp] = sizes.get(comp, 0) + 1
    got_clusters = {
        (r.canonical_doc, r.cluster_size)
        for r in QUERIES["dedup_minhash_components"].fn(spark, SMOKE_SF_DIR).collect()
    }
    assert got_clusters == set(sizes.items())


def test_chunking_reconstruction_invariant(spark):
    """Lossless-coverage property of the chunker: chunk 0's tokens plus
    each later chunk's tokens after dropping the (size - stride)-token
    overlap must rebuild every document's exact token sequence — no token
    lost or duplicated at any window boundary (including the final
    partial window)."""
    from mapreduceindex_demo_spark.functions.text import chunks

    size, stride = 16, 12
    docs = load_table(spark, SMOKE_SF_DIR, "documents").limit(80)
    rows = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("tokens"),
        chunks("text", size, stride).alias("chs"),
    ).collect()
    assert any(len(r.chs) > 1 for r in rows)  # fan-out actually exercised
    for r in rows:
        rebuilt = list(r.chs[0].split(" "))
        for ch in r.chs[1:]:
            rebuilt.extend(ch.split(" ")[size - stride:])
        assert rebuilt == list(r.tokens), r.doc_id


def test_minhash_signature_table_matches_projection_form(spark):
    """The aggregation-form signature builder (exploded shingles +
    codegen md5 + partial-agg MIN — the executing path everywhere) must
    be BIT-IDENTICAL to the straightforward HOF-projection spelling,
    which stays in the codebase as the executable spec this test runs."""
    from mapreduceindex_demo_spark.functions import dedup as D

    d = load_table(spark, SMOKE_SF_DIR, "documents")
    # include a NULL-text document: the projection form keeps it (all-NULL
    # signature), so the aggregation form must too (explode_outer — a
    # plain explode silently drops the row)
    d = d.select("doc_id", "text").unionByName(
        spark.createDataFrame([(10**9, None)], "doc_id long, text string")
    )
    spec = d.select("doc_id", *D.minhash_signature()).collect()
    fast = D.minhash_signature_table(d, "doc_id").collect()
    assert sorted(map(tuple, spec), key=str) == sorted(map(tuple, fast), key=str)
    assert any(r[0] == 10**9 for r in fast)


def test_inverted_index_jaccard_matches_pairwise_spec(spark):
    """The inverted-index Jaccard (the executing path of
    dedup_ngram_jaccard_top20) must equal the direct pairwise spelling
    over D.jaccard — the HOF form stays in the library as the executable
    spec this test runs on the smoke corpus."""
    from mapreduceindex_demo_spark.functions import dedup as D
    from mapreduceindex_demo_spark.plans import QUERIES

    d = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "lang", F.array_distinct(D.shingles()).alias("g")
    )
    a, b = d.alias("a"), d.alias("b")
    spec = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            D.jaccard(F.col("a.g"), F.col("b.g")).alias("jac"),
        )
        .orderBy(F.desc("jac"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
        .collect()
    )
    fast = (
        QUERIES["dedup_ngram_jaccard_top20"].fn(spark, SMOKE_SF_DIR).collect()
    )
    assert [tuple(r) for r in spec] == [tuple(r) for r in fast]


def test_affine_minhash_estimates_jaccard(spark):
    """Quality contract for the CPU-scale affine MinHash family: the
    component-match fraction between two signatures estimates the exact
    shingle-set Jaccard. Docs are built with CONTROLLED overlap (token
    windows over a shared sequence), 16 hash functions; the estimator is
    deterministic (md5-seeded), so the tolerance is a fixed check, not a
    flaky statistical one. Also pins the family's invariants: identical
    docs → identical signatures; signatures are order-free in the
    shingle set."""
    from mapreduceindex_demo_spark.functions import dedup as D

    toks = [f"w{i}" for i in range(120)]
    docs = [
        (0, " ".join(toks[0:80])),
        (1, " ".join(toks[0:80])),      # identical to 0
        (2, " ".join(toks[20:100])),    # heavy overlap with 0
        (3, " ".join(toks[60:120])),    # light overlap with 0
        (4, " ".join(f"x{i}" for i in range(80))),  # disjoint from 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {
        r["doc_id"]: [r[f"mh_{j}"] for j in range(16)]
        for r in D.minhash_signature_table_affine(
            df, "doc_id", funcs=16
        ).collect()
    }

    def grams(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    def exact(a, b):
        ga, gb = grams(docs[a][1]), grams(docs[b][1])
        return len(ga & gb) / len(ga | gb)

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / 16.0

    assert sigs[0] == sigs[1]                      # identical docs
    assert est(0, 4) == 0.0                        # disjoint docs
    for pair in [(0, 2), (0, 3), (2, 3)]:
        assert abs(est(*pair) - exact(*pair)) <= 0.30, (
            pair, est(*pair), exact(*pair)
        )
    # heavier overlap must not estimate LOWER than light overlap
    assert est(0, 2) >= est(0, 3)


def _segments_of(spark, rows):
    """Run the [q:dedup_cdc_segments] segmentation (same expressions) on an
    in-memory (doc_id, text) frame and return {doc_id: [segment, ...]} in
    document order."""
    from pyspark.sql import Window

    d = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "term")
    )
    wseq = Window.partitionBy("doc_id").orderBy("p")
    prev = F.lag("term").over(wseq)
    flag = F.when(
        prev.isNotNull()
        & F.substring(
            F.md5(F.concat(prev, F.lit(" "), F.col("term"))), 1, 1
        ).isin("0", "1"),
        1,
    ).otherwise(0)
    s2 = toks.withColumn("flag", flag).withColumn(
        "seg", F.sum("flag").over(wseq)
    )
    segs = (
        s2.groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "term"))),
                    lambda x: x["term"],
                ),
                " ",
            ).alias("seg_text")
        )
        .orderBy("doc_id", "seg")
        .collect()
    )
    out: dict[int, list[str]] = {}
    for r in segs:
        out.setdefault(r.doc_id, []).append(r.seg_text)
    return out


def test_cdc_segments_partition_the_document(spark):
    """Invariant: the segments of a document, joined in order, reconstruct
    the document exactly (segmentation is a partition, never lossy)."""
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    segs = _segments_of(spark, texts)
    for doc_id, text in texts:
        assert " ".join(segs[doc_id]) == text


def test_cdc_segments_are_shift_robust(spark):
    """The selling point vs fixed-stride chunking: a paragraph shared by
    two documents at DIFFERENT offsets still yields identical interior
    segments, because boundaries depend only on local content. Interior
    segments (those not touching either document's edges, where the
    surrounding context differs) must coincide."""
    shared = " ".join(f"tok{i}" for i in range(120))
    a = "prefixA " + shared
    b = "completely different longer prefix here " + shared
    segs = _segments_of(spark, [(0, a), (1, b)])
    # After the first content-defined boundary inside the shared
    # paragraph, the two segmentations resynchronize and stay identical
    # to the end of the document — so (ignoring each doc's first segment,
    # which absorbs its differing prefix) the segment lists share a long
    # common SUFFIX. Fixed-stride chunking shares none unless offsets
    # happen to align.
    sa, sb = segs[0], segs[1]
    common = 0
    while (
        common < min(len(sa), len(sb))
        and sa[-1 - common] == sb[-1 - common]
    ):
        common += 1
    assert common >= 2, (sa, sb)
    # and the shared tail covers most of the shared paragraph's tokens
    shared_toks = sum(len(s.split(" ")) for s in sa[-common:])
    assert shared_toks >= 80, (common, shared_toks)


def test_split_assignment_is_leakproof_by_construction(spark):
    """Duplicate content must land in ONE split even when it arrives via
    different sources and doc ids — the property doc_id-keyed splitting
    lacks."""
    rows = []
    for i in range(200):
        text = f"shared document body number {i % 40}"
        rows.append((i, text, f"src{i % 5}"))
    d = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    fp1 = F.substring(F.md5("text"), 1, 1)
    split = (
        F.when(fp1.isin("c", "d"), "val")
        .when(fp1.isin("e", "f"), "test")
        .otherwise("train")
    )
    per_fp = (
        d.select(F.md5("text").alias("fp"), split.alias("split"))
        .groupBy("fp")
        .agg(F.countDistinct("split").alias("nsplits"))
        .agg(F.max("nsplits").alias("m"))
        .collect()[0]
    )
    assert per_fp.m == 1


def test_neardup_brute_cap_sample_order_agrees_across_engines(spark):
    """The r13 sample cap on dedup_embedding_neardup_top20 selects the
    first _NEARDUP_BRUTE_CAP vectors under ORDER BY md5(id-as-string):
    both engines must rank ids IDENTICALLY or they would cap DIFFERENT
    subsets once a corpus exceeds the cap — a divergence the sf0.01
    parity gate cannot see (the cap is a no-op there). Pin the full
    ranking on a synthetic id set from both engines."""
    import duckdb

    ids = list(range(0, 400, 7)) + [999_999_937, 2**40 + 3]
    sdf = (
        spark.createDataFrame([(i,) for i in ids], "vec_id LONG")
        .orderBy(F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id")
        .select("vec_id")
    )
    got_spark = [r.vec_id for r in sdf.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(vec_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM t ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id"
        ).fetchall()
    ]
    assert got_spark == got_duck
    # and the order is the md5 order, not the id order (the sample is
    # genuinely pseudo-random)
    assert got_spark != sorted(got_spark)
