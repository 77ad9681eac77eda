"""Independent recomputation of the perceptual average-hash dedup: a
pure-Python (no numpy bincount) aHash over the document payloads, the
cluster rollup, and the zero-shuffle-before-groupBy plan shape."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.functions.multimodal import ahash
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import PARITY_SF_DIR


def _py_ahash(payload: bytes) -> str:
    n = len(payload)
    h = -(-n // 16)
    sums = [0] * 64
    cnts = [0] * 64
    total = 0
    for i, v in enumerate(payload):
        cell = ((i // 16) * 8 // h) * 8 + (i % 16) // 2
        sums[cell] += v
        cnts[cell] += 1
        total += v
    bits = [
        1 if cnts[k] > 0 and sums[k] * n >= total * cnts[k] else 0
        for k in range(64)
    ]
    hi = sum(bits[k] << (31 - k) for k in range(32))
    lo = sum(bits[32 + k] << (31 - k) for k in range(32))
    return f"{hi:08X}{lo:08X}"


def test_ahash_matches_python(spark):
    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    expect = {r["doc_id"]: _py_ahash(r["text"].encode("utf-8")) for r in docs}
    d = load_table(spark, PARITY_SF_DIR, "documents")
    got = {r.doc_id: r.ahash for r in ahash(d).collect()}
    assert got == expect


def test_ahash_dedup_clusters_match_python(spark):
    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    groups: dict[str, list[int]] = {}
    for r in docs:
        groups.setdefault(_py_ahash(r["text"].encode("utf-8")), []).append(
            r["doc_id"]
        )
    n_images = len(docs)
    n_distinct = len(groups)
    n_dup = sum(len(v) for v in groups.values() if len(v) > 1)
    top = sorted(
        ((len(v), h, min(v)) for h, v in groups.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    rows = QUERIES["multimodal_ahash_dedup"].fn(spark, PARITY_SF_DIR).collect()
    assert [(r.group_size, r.ahash, r.canonical_doc) for r in rows] == top
    for r in rows:
        assert (r.n_images, r.n_distinct_hashes, r.n_dup_images) == (
            n_images,
            n_distinct,
            n_dup,
        )
    # identical payloads must actually cluster at test scale
    assert rows[0].group_size > 1
    # and the hash must discriminate (not everything in one bucket)
    assert n_distinct > n_images // 2


def test_ahash_plan_zero_shuffle_before_group(spark):
    """Hashing is partition-local (mapInPandas straight off the scan);
    the only wide exchanges are the hash groupBy and the 1-row totals;
    the totals ride a broadcast crossJoin, never a window over the
    group table."""
    df = QUERIES["multimodal_ahash_dedup"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan

def test_ahash_generalizes_to_non_default_widths(spark):
    """The kernel reads the raster width from the container header —
    cell_col must be ``col*8 // width`` for ANY width, not the 16-wide
    shortcut ``col // 2`` (regression: width-32 rasters aliased columns
    past the 8x8 grid, silently dropping pixels from the hash)."""
    import pandas as pd

    def py_ahash_w(payload: bytes, width: int) -> str:
        n = len(payload)
        if n == 0:
            return "0" * 16
        h = -(-n // width)
        sums, cnts, total = [0] * 64, [0] * 64, 0
        for i, v in enumerate(payload):
            cell = ((i // width) * 8 // h) * 8 + (i % width) * 8 // width
            sums[cell] += v
            cnts[cell] += 1
            total += v
        bits = [
            1 if cnts[k] > 0 and sums[k] * n >= total * cnts[k] else 0
            for k in range(64)
        ]
        hi = sum(bits[k] << (31 - k) for k in range(32))
        lo = sum(bits[32 + k] << (31 - k) for k in range(32))
        return f"{hi:08X}{lo:08X}"

    texts = ["", "x", "the quick brown fox jumps over the lazy dog " * 9]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for width in (8, 16, 32, 100):
        got = {r.doc_id: r.ahash for r in ahash(df, width=width).collect()}
        expect = {
            i: py_ahash_w(t.encode("utf-8"), width)
            for i, t in enumerate(texts)
        }
        assert got == expect, width
    # width must actually change the hash of a wide raster — otherwise
    # this test couldn't catch a kernel that ignores the header width
    long = texts[2].encode("utf-8")
    assert py_ahash_w(long, 8) != py_ahash_w(long, 32)


def test_ahash_neardup_matches_bruteforce_python(spark):
    """Hamming-radius near-dup: pure-Python brute force over distinct
    hashes is the recall contract — the banded multi-index must find
    EVERY pair within radius (lossless by pigeonhole at radius < bands).
    Also checks the pigeonhole premise itself on real pairs: every
    qualifying pair shares at least one exact 16-bit band."""
    from mapreduceindex_demo_spark.plans.llm import _AHASH_BANDS, _AHASH_RADIUS

    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    groups: dict[str, list[int]] = {}
    for r in docs:
        groups.setdefault(_py_ahash(r["text"].encode("utf-8")), []).append(
            r["doc_id"]
        )
    uniq = sorted(groups)
    expect = []
    for i, ha in enumerate(uniq):
        for hb in uniq[i + 1 :]:
            d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
            if d <= _AHASH_RADIUS:
                expect.append(
                    (
                        ha,
                        hb,
                        d,
                        len(groups[ha]),
                        len(groups[hb]),
                        min(groups[ha]),
                        min(groups[hb]),
                    )
                )
    expect.sort(key=lambda t: (t[2], t[0], t[1]))
    rows = QUERIES["multimodal_ahash_neardup"].fn(spark, PARITY_SF_DIR).collect()
    got = [
        (r.hash_a, r.hash_b, r.hamming_dist, r.size_a, r.size_b, r.canon_a, r.canon_b)
        for r in rows
    ]
    assert got == expect
    # non-trivial at test scale, and distance 0 is impossible by ha < hb
    # over DISTINCT hashes (exact dups belong to multimodal_ahash_dedup)
    assert len(got) > 0
    assert all(1 <= r.hamming_dist <= _AHASH_RADIUS for r in rows)
    # the pigeonhole premise, checked concretely
    for ha, hb, *_ in expect:
        shared = sum(
            ha[4 * b : 4 * b + 4] == hb[4 * b : 4 * b + 4]
            for b in range(_AHASH_BANDS)
        )
        assert shared >= 1, (ha, hb)


def test_ahash_clusters_match_union_find_python(spark):
    """The dedup DECISION: pure-Python union-find over the brute-force
    radius-3 distinct-hash pairs, plus exact-dup singleton groups, must
    reproduce the clusters rollup row-for-row — the third implementation
    beside the Spark plan and the recursive-CTE oracle."""
    from mapreduceindex_demo_spark.plans.llm import _AHASH_RADIUS

    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    groups: dict[str, list[int]] = {}
    for r in docs:
        groups.setdefault(_py_ahash(r["text"].encode("utf-8")), []).append(
            r["doc_id"]
        )
    uniq = sorted(groups)
    parent = {h: h for h in uniq}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, ha in enumerate(uniq):
        for hb in uniq[i + 1 :]:
            if bin(int(ha, 16) ^ int(hb, 16)).count("1") <= _AHASH_RADIUS:
                ra, rb = find(ha), find(hb)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list[str]] = {}
    for h in uniq:
        comps.setdefault(find(h), []).append(h)
    expect = []
    for root, hs in comps.items():
        cluster = min(hs)  # min-label convention, same as the operator
        n_images = sum(len(groups[h]) for h in hs)
        if n_images >= 2:
            expect.append(
                (
                    cluster,
                    min(min(groups[h]) for h in hs),
                    len(hs),
                    n_images,
                    n_images - 1,
                )
            )
    expect.sort(key=lambda t: (-t[3], t[0]))

    rows = QUERIES["multimodal_ahash_clusters"].fn(spark, PARITY_SF_DIR).collect()
    got = [
        (r.cluster, r.canonical_doc, r.n_hashes, r.n_images, r.n_dropped)
        for r in rows
    ]
    assert got == expect
    # non-trivial: at least one TRANSITIVE cluster (>= 2 distinct hashes)
    # so the components step is actually exercised, not just exact groups
    assert any(r.n_hashes >= 2 for r in rows)
    assert any(r.n_hashes == 1 for r in rows)  # and exact-dup singletons


def test_ahash_clusters_plan_shape(spark):
    """The scale claims, machine-checked: everything after the one
    mapInPandas hash pass operates on |unique signatures| rows — the
    final rollup joins the PERSISTED distinct-hash relation (no second
    hash pass), never a cartesian, and exactly one Python stage."""
    df = QUERIES["multimodal_ahash_clusters"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan, plan
    # the label join reads the cached distinct-hash groups, not a re-run
    # of the hash pass: the only MapInPandas lives inside the
    # InMemoryRelation's cached plan, so the executed tree shows the
    # cache scan and no top-level Python stage
    assert "InMemoryTableScan" in plan, plan
    assert "MapInPandas" not in plan.split("InMemoryRelation")[0], plan


def test_ahash_apply_ledger_matches_python(spark):
    """The APPLY ledger recomputed in pure Python from the payloads: hash
    every doc, union-find the radius-3 hash graph, and for every cluster
    with >= 2 images list each non-canonical member — exactly the rows
    the query must emit, with source and keeper attribution."""
    from mapreduceindex_demo_spark.plans.llm import _AHASH_RADIUS

    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet",
        columns=["doc_id", "source", "text"],
    ).to_pylist()
    src = {r["doc_id"]: r["source"] for r in docs}
    groups: dict[str, list[int]] = {}
    for r in docs:
        groups.setdefault(_py_ahash(r["text"].encode("utf-8")), []).append(
            r["doc_id"]
        )
    uniq = sorted(groups)
    parent = {h: h for h in uniq}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, ha in enumerate(uniq):
        for hb in uniq[i + 1 :]:
            if bin(int(ha, 16) ^ int(hb, 16)).count("1") <= _AHASH_RADIUS:
                ra, rb = find(ha), find(hb)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list[str]] = {}
    for h in uniq:
        comps.setdefault(find(h), []).append(h)
    expect = []
    for hs in comps.values():
        cluster = min(hs)  # min-label convention, same as the operator
        members = sorted(d for h in hs for d in groups[h])
        if len(members) >= 2:
            canonical = members[0]
            expect.extend(
                (d, src[d], cluster, canonical) for d in members[1:]
            )
    expect.sort(key=lambda t: (t[2], t[0]))

    rows = QUERIES["multimodal_ahash_apply"].fn(spark, PARITY_SF_DIR).collect()
    got = [(r.doc_id, r.source, r.cluster, r.canonical_doc) for r in rows]
    assert got == expect
    assert len(got) > 0  # the fixture really has droppable near-dups


def test_ahash_apply_consistent_with_clusters_decision(spark):
    """ACTION == DECISION: per cluster, the ledger drops exactly
    n_dropped docs, never the canonical keeper, and the kept corpus
    (documents anti-join ledger) retains exactly one member of every
    >=2-image cluster — the contract that lets a retention pipeline
    compose the two queries."""
    led = QUERIES["multimodal_ahash_apply"].fn(spark, PARITY_SF_DIR).collect()
    dec = QUERIES["multimodal_ahash_clusters"].fn(spark, PARITY_SF_DIR).collect()
    drops: dict[str, list] = {}
    for r in led:
        drops.setdefault(r.cluster, []).append(r)
    assert set(drops) == {r.cluster for r in dec}
    for c in dec:
        rows = drops[c.cluster]
        assert len(rows) == c.n_dropped, c
        assert all(r.canonical_doc == c.canonical_doc for r in rows), c
        assert all(r.doc_id != c.canonical_doc for r in rows), c


def test_ahash_apply_plan_shape(spark):
    """Scale claims machine-checked: the hash kernel runs ONCE (the
    ledger join reads the persisted hash frame — no MapInPandas outside
    an InMemoryRelation), the corpus-sized ledger join is a broadcast
    probe (no shuffle join), and nothing crosses."""
    df = QUERIES["multimodal_ahash_apply"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final, final
    assert "SortMergeJoin" not in final, final
    assert "MapInPandas" not in final.split("InMemoryRelation")[0], final


def test_ahash_apply_correct_without_broadcast(spark):
    """The ledger's broadcast-probe posture is a PLANNER choice, not a
    hint (the same rule the round-12 SNM fix enforces): with both
    broadcast thresholds disabled — the stand-in for a decision frame
    that outgrew them — the same plan must degrade to shuffle joins and
    emit the identical ledger."""
    from tests.conftest import no_broadcast

    baseline = sorted(
        tuple(r)
        for r in QUERIES["multimodal_ahash_apply"].fn(spark, PARITY_SF_DIR).collect()
    )
    with no_broadcast(spark):
        df = QUERIES["multimodal_ahash_apply"].fn(spark, PARITY_SF_DIR)
        got = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the degradation really happened: no broadcast build anywhere
        # in the final plan (a future F.broadcast hint would keep one
        # and this assertion, not just the row compare, catches it)
        assert "BroadcastHashJoin" not in final, final
    assert got == baseline
