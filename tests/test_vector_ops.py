"""Independent (NumPy) recomputation checks for the round-7b vector
operators — a third implementation besides the Spark plan and the DuckDB
oracle, so a shared misconception between the two can't hide."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.plans.vector_ops import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
)
from tests.conftest import PARITY_SF_DIR


def _embeddings():
    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, embs


def test_centroid_monitor_matches_numpy(spark):
    ids, embs = _embeddings()
    src = {
        r["doc_id"]: r["source"]
        for r in pq.read_table(
            f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        ).to_pylist()
    }
    mic = np.floor(embs * 1_000_000).astype(np.int64)
    by_src: dict[str, list[int]] = {}
    for i, vid in enumerate(ids):
        by_src.setdefault(src[vid], []).append(i)
    got = {
        r.source: r
        for r in QUERIES["embedding_source_centroids"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(by_src)
    for s, rows_idx in by_src.items():
        m = mic[rows_idx]  # (n, 64) int64
        n = m.shape[0]
        S = m.sum(axis=0)  # exact (int64 accumulate)
        l1 = int(np.abs(S).sum()) / (n * 1_000_000.0)
        dev = int(np.abs(m * n - S).sum()) / float(n * n * 64 * 1_000_000)
        r = got[s]
        assert r.n_vecs == n
        assert abs(r.centroid_l1 - round(l1, 6)) < 2e-6, (s, r.centroid_l1, l1)
        assert abs(r.mean_abs_dispersion - round(dev, 6)) < 2e-6
        assert r.mean_abs_dispersion > 0.0


def test_mmr_matches_numpy_greedy_and_diversifies(spark):
    ids, embs = _embeddings()
    byid = {v: embs[i] for i, v in enumerate(ids)}
    q = byid[0]

    def cos(a, b):
        # mirror the in-order fold + 6dp grid
        num = float(sum(float(x) * float(y) for x, y in zip(a, b)))
        den = math.sqrt(sum(float(x) * float(x) for x in a)) * math.sqrt(
            sum(float(y) * float(y) for y in b)
        )
        return engine_round(num / den, 6)

    rel = {v: cos(byid[v], q) for v in ids if v != 0}
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
    sims = {
        (a, b): cos(byid[a], byid[b]) for a in pool for b in pool if a != b
    }
    picked = [max(pool, key=lambda v: (rel[v], -v))]
    scores = [rel[picked[0]]]
    while len(picked) < _MMR_K:
        rest = [v for v in pool if v not in picked]
        sc = {
            v: engine_round(
                _MMR_LAMBDA * rel[v]
                - engine_round(1 - _MMR_LAMBDA, 6)
                * max(sims[(v, p)] for p in picked),
                6,
            )
            for v in rest
        }
        nxt = max(rest, key=lambda v: (sc[v], -v))
        picked.append(nxt)
        scores.append(sc[nxt])

    rows = sorted(
        QUERIES["similarity_mmr_rerank"].fn(spark, PARITY_SF_DIR).collect(),
        key=lambda r: r.step,
    )
    assert [r.vec_id for r in rows] == picked
    for r, s in zip(rows, scores):
        assert abs(r.score - s) < 2e-6
    # the re-rank must actually diversify: not the plain top-k prefix
    plain = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_K]
    assert [r.vec_id for r in rows] != plain
    assert len({r.vec_id for r in rows}) == _MMR_K


def _fold_sum(vals):
    """In-order left fold, mirroring F.aggregate / DuckDB list_reduce."""
    acc = 0.0
    for v in vals:
        acc += float(v)
    return acc


def _cos6(a, b):
    num = _fold_sum(x * y for x, y in zip(a, b))
    den = math.sqrt(_fold_sum(x * x for x in a)) * math.sqrt(
        _fold_sum(y * y for y in b)
    )
    return engine_round(num / den, 6)


def test_pq_adc_matches_numpy(spark):
    """Third implementation of the PQ-ADC pipeline: seeds -> one Lloyd
    pass on the bounded sample -> corpus coding -> ADC table -> top-k,
    every subspace distance floored to exact integer micro-units."""
    from mapreduceindex_demo_spark.plans.vector_ops import (
        _PQ_K,
        _PQ_M,
        _PQ_SAMPLE,
        _PQ_SUB,
        _PQ_TOPK,
    )

    ids, embs = _embeddings()
    byid = {v: embs[i] for i, v in enumerate(ids)}

    def subv(vid, s):
        return byid[vid][s * _PQ_SUB : (s + 1) * _PQ_SUB]

    def dm(a, b):
        return int(math.floor(1_000_000 * _fold_sum((x - y) * (x - y) for x, y in zip(a, b))))

    # seed codebook: subvectors of vec_id 1.._PQ_K
    seeds = {s: {cid: subv(cid, s) for cid in range(1, _PQ_K + 1)} for s in range(_PQ_M)}
    # one Lloyd pass over the bounded sample
    members: dict[tuple[int, int], list] = {}
    for vid in [v for v in ids if 1 <= v <= _PQ_SAMPLE]:
        for s in range(_PQ_M):
            sv = subv(vid, s)
            best = min(seeds[s], key=lambda cid: (dm(sv, seeds[s][cid]), cid))
            members.setdefault((s, best), []).append(sv)
    codebook = {
        (s, cid): [engine_round(float(np.mean([m[d] for m in mem])), 6) for d in range(_PQ_SUB)]
        for (s, cid), mem in members.items()
    }
    # code the corpus + ADC lookup table for the query vector
    dtab = {
        (s, cid): dm(subv(0, s), cv) for (s, cid), cv in codebook.items()
    }
    micro = {}
    for vid in ids:
        if vid == 0:
            continue
        total = 0
        for s in range(_PQ_M):
            sv = subv(vid, s)
            cands = [(cid, cv) for (cs, cid), cv in codebook.items() if cs == s]
            code = min(cands, key=lambda t: (dm(sv, t[1]), t[0]))[0]
            total += dtab[(s, code)]
        micro[vid] = total
    expect = sorted(micro, key=lambda v: (micro[v], v))[:_PQ_TOPK]

    rows = QUERIES["similarity_pq_adc_ann"].fn(spark, PARITY_SF_DIR).collect()
    assert [r.vec_id for r in rows] == expect
    for r in rows:
        assert abs(r.approx_dist - round(micro[r.vec_id] / 1_000_000.0, 6)) < 1e-9
    # ADC is an approximation of true distance, not equal to it: at least
    # one ranked distance must differ from the exact subspace-sum distance
    exact0 = {
        v: sum(dm(subv(v, s), subv(0, s)) for s in range(_PQ_M)) for v in expect
    }
    assert any(micro[v] != exact0[v] for v in expect)


def test_projection_recall_matches_numpy(spark):
    """Third implementation of the JL-projection recall contract: project
    64 -> 8 dims through the deterministic integer plane family, compare
    projected-space top-20 against exact top-20."""
    from mapreduceindex_demo_spark.plans.vector_ops import _PROJ_DIMS, _PROJ_K

    ids, embs = _embeddings()
    byid = {v: embs[i] for i, v in enumerate(ids)}
    planes = [
        [float((((i - 1) * 31 + j * 17) % 7) - 3) for i in range(1, 65)]
        for j in range(_PROJ_DIMS)
    ]

    def proj(v):
        return [_fold_sum(x * w for x, w in zip(v, p)) for p in planes]

    q = byid[0]
    corpus = [v for v in ids if v != 0]
    exact = sorted(corpus, key=lambda v: (-_cos6(byid[v], q), v))[:_PROJ_K]
    pq_ = proj(q)
    projected = sorted(corpus, key=lambda v: (-_cos6(proj(byid[v]), pq_), v))[:_PROJ_K]
    n_overlap = len(set(exact) & set(projected))

    rows = QUERIES["similarity_projection_recall"].fn(spark, PARITY_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_overlap == n_overlap
    assert abs(getattr(r, f"recall_at_{_PROJ_K}") - engine_round(n_overlap / _PROJ_K, 6)) < 1e-9
    assert r.proj_dims == _PROJ_DIMS
    # the contract is meaningful only if the projection is lossy-but-useful
    assert 0 < n_overlap < _PROJ_K


def test_ivf_pq_matches_numpy(spark):
    """Third implementation of the IVF-PQ composition: Python-trained
    coarse quantizer (2 Lloyd passes, 6-dp grid) prunes to nprobe cells,
    PQ codes + ADC table rank the survivors."""
    from mapreduceindex_demo_spark.plans.llm import (
        _IVF_CENTROIDS,
        _IVF_ITERS,
        _IVF_NPROBE,
    )
    from mapreduceindex_demo_spark.plans.vector_ops import (
        _PQ_K,
        _PQ_M,
        _PQ_SAMPLE,
        _PQ_SUB,
        _PQ_TOPK,
    )

    ids, embs = _embeddings()
    byid = {v: embs[i] for i, v in enumerate(ids)}
    corpus = sorted(v for v in ids if v != 0)

    # --- coarse quantizer: seeds = first k corpus vectors, 2 Lloyd passes
    cents = {cid: list(byid[cid]) for cid in corpus[:_IVF_CENTROIDS]}

    def assign(v):
        return max(
            cents, key=lambda cid: (_cos6(byid[v], cents[cid]), -cid)
        )

    for _ in range(_IVF_ITERS):
        members: dict[int, list] = {}
        for v in corpus:
            members.setdefault(assign(v), []).append(byid[v])
        cents = {
            cid: [engine_round(float(np.mean([m[d] for m in mem])), 6) for d in range(64)]
            for cid, mem in members.items()
        }
    probes = sorted(
        cents, key=lambda cid: (-_cos6(byid[0], cents[cid]), cid)
    )[:_IVF_NPROBE]
    cand = [v for v in corpus if assign(v) in probes]
    assert 0 < len(cand) < len(corpus)  # pruning actually pruned

    # --- PQ pieces (same recomputation as test_pq_adc_matches_numpy)
    def subv(vid, s):
        return byid[vid][s * _PQ_SUB : (s + 1) * _PQ_SUB]

    def dm(a, b):
        return int(math.floor(1_000_000 * _fold_sum((x - y) * (x - y) for x, y in zip(a, b))))

    seeds = {s: {cid: subv(cid, s) for cid in range(1, _PQ_K + 1)} for s in range(_PQ_M)}
    members2: dict[tuple[int, int], list] = {}
    for vid in [v for v in ids if 1 <= v <= _PQ_SAMPLE]:
        for s in range(_PQ_M):
            sv = subv(vid, s)
            best = min(seeds[s], key=lambda cid: (dm(sv, seeds[s][cid]), cid))
            members2.setdefault((s, best), []).append(sv)
    codebook = {
        (s, cid): [engine_round(float(np.mean([m[d] for m in mem])), 6) for d in range(_PQ_SUB)]
        for (s, cid), mem in members2.items()
    }
    dtab = {(s, cid): dm(subv(0, s), cv) for (s, cid), cv in codebook.items()}
    micro = {}
    for vid in cand:
        total = 0
        for s in range(_PQ_M):
            sv = subv(vid, s)
            cands = [(cid, cv) for (cs, cid), cv in codebook.items() if cs == s]
            code = min(cands, key=lambda t: (dm(sv, t[1]), t[0]))[0]
            total += dtab[(s, code)]
        micro[vid] = total
    expect = sorted(micro, key=lambda v: (micro[v], v))[:_PQ_TOPK]

    rows = QUERIES["similarity_ivf_pq_ann"].fn(spark, PARITY_SF_DIR).collect()
    assert [r.vec_id for r in rows] == expect
    for r in rows:
        assert abs(r.approx_dist - round(micro[r.vec_id] / 1_000_000.0, 6)) < 1e-9


def test_ivf_pq_hints_only_bounded_sides(spark):
    """The hint-free policy, pinned: the composed plan hints ONLY
    constant-bounded sides — trained centroids (k rows, once per Lloyd
    pass + once for ranking), probe list (nprobe rows), PQ seeds +
    codebook + ADC table (m·k rows each) — and the data-dependent
    candidate set carries NO hint. The analyzed TREE duplicates shared
    hinted subtrees (the centroid chain appears under both the probe and
    the assignment branch), so the textual count is 12; a 13th hint
    appearing here means someone hinted a data-dependent side."""
    df = QUERIES["similarity_ivf_pq_ann"].fn(spark, PARITY_SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 12, analyzed


def test_hamming_ann_matches_numpy_sign_xor(spark):
    from mapreduceindex_demo_spark.plans.vector_ops import (
        _HAM_NQ,
        _HAM_TOPK,
        _HAM_WORDS,
    )

    ids, embs = _embeddings()
    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    bits = (embs[order] > 0).astype(np.uint64)  # (n, 64) sign bits
    # pack 32 bits per word, LSB-first — must match _spark_pack_word
    words = np.zeros((len(ids), _HAM_WORDS), dtype=np.uint64)
    for j in range(_HAM_WORDS):
        for b in range(32):
            words[:, j] |= bits[:, 32 * j + b] << np.uint64(b)

    got = (
        QUERIES["similarity_hamming_ann"].fn(spark, PARITY_SF_DIR).collect()
    )
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)

    assert set(by_q) == set(range(_HAM_NQ))
    idx = {v: i for i, v in enumerate(ids)}
    for qid, rows in by_q.items():
        qw = words[idx[qid]]
        dists = [
            (
                int(
                    sum(
                        bin(int(qw[j]) ^ int(words[i, j])).count("1")
                        for j in range(_HAM_WORDS)
                    )
                ),
                vid,
            )
            for i, vid in enumerate(ids)
            if vid != qid
        ]
        expect = sorted(dists)[:_HAM_TOPK]
        rows = sorted(rows, key=lambda r: r.rnk)
        assert [(r.hamming_dist, r.neighbor_id) for r in rows] == expect
        assert [r.rnk for r in rows] == list(range(1, _HAM_TOPK + 1))


def test_hamming_ann_plan_broadcasts_query_side_no_sort_join(spark):
    """The candidate pass must be a broadcast of the 5-row query side into
    the signature scan — never a shuffle join or cartesian of float
    vectors. Signature packing is scan-local (no exchange before the
    distance filter)."""
    df = QUERIES["similarity_hamming_ann"].fn(spark, PARITY_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kcenter_coreset_matches_numpy_greedy(spark):
    """Farthest-point traversal re-derived in NumPy over the same parquet:
    seed = lowest vec_id, distance = 1 - round(cosine, 6), argmax with the
    (mind DESC, vec_id ASC) tiebreak — selection order and radii must match
    exactly, and the radius sequence must be non-increasing (the k-center
    coverage certificate)."""
    from mapreduceindex_demo_spark.plans.vector_ops import _KC_K

    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    vecs = np.array(
        [np.array(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    keep = ids != 0
    ids, vecs = ids[keep], vecs[keep]
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    norms = np.sqrt((vecs * vecs).sum(axis=1))

    def dists_to(j):
        raw = vecs @ vecs[j] / (norms * norms[j])
        cos = np.array([engine_round(float(c), 6) for c in raw])
        return 1.0 - (cos + 0.0)

    sel = [0]
    mind = dists_to(0)
    expected = [(1, int(ids[0]), None)]
    for rank in range(2, _KC_K + 1):
        # argmax with vec_id tiebreak: numpy argmax takes the first max,
        # and ids are sorted ascending
        j = int(np.argmax(mind))
        expected.append((rank, int(ids[j]), engine_round(float(mind[j]), 6)))
        sel.append(j)
        mind = np.minimum(mind, dists_to(j))
    got = [
        (r.sel_rank, r.vec_id, None if r.min_dist is None else round(r.min_dist, 6))
        for r in QUERIES["curation_kcenter_coreset"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    radii = [d for _, _, d in got if d is not None]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_plan_no_pairwise_join_no_corpus_shuffle(spark):
    """The operator's scale contract: every join is a 1-row broadcast
    (seed / next-center), never a pairwise corpus join, and no exchange
    is keyed on vec_id — the only ordered exchange is the TakeOrdered
    heap merge."""
    import re

    df = QUERIES["curation_kcenter_coreset"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    for m in re.finditer(r"Exchange (\w+partitioning)\(([^)]*)\)", plan):
        assert "vec_id" not in m.group(2), plan


def test_abtt_anisotropy_matches_numpy(spark):
    """The full all-but-the-top chain — 6-dp mean/second-moment grid,
    covariance assembly, the shared driver-side power iteration, top
    variance/trace/share, per-label projections — re-derived with NumPy
    over the same parquet and compared exactly."""
    from mapreduceindex_demo_spark.plans.vector_ops import (
        _ABTT_DIM,
        abtt_g6,
        abtt_power_iteration,
    )

    g = lambda x: abtt_g6(float(x))  # noqa: E731
    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    labels = np.array(t.column("label").to_pylist())
    X = np.array(
        [np.array(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    dim = _ABTT_DIM
    mu = [g(m) for m in X.mean(axis=0)]
    M = (X[:, :, None] * X[:, None, :]).mean(axis=0)
    C = [[g(g(M[i][j]) - mu[i] * mu[j]) for j in range(dim)] for i in range(dim)]
    v = abtt_power_iteration(C)
    var_top = g(sum(C[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)))
    trace = g(sum(C[i][i] for i in range(dim)))
    p = np.array([g(x) for x in X @ np.array(v)])
    expected = []
    for lab in sorted(set(labels.tolist())):
        sel = p[labels == lab]
        expected.append(
            (lab, len(sel), g(sel.mean()), g((sel * sel).mean()),
             var_top, trace, g(var_top / trace))
        )
    got = [
        tuple(r)
        for r in QUERIES["embedding_anisotropy_abtt"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # the diagnostic finds genuine anisotropy: the top direction holds
    # more variance than an isotropic 1/dim share
    assert got[0][6] > 1.0 / dim


def test_abtt_plan_no_join_no_vec_exchange(spark):
    """The scoring pass's scale contract: the trained direction enters as
    a LITERAL array (no join anywhere), and no exchange is keyed on
    vec_id — the per-label rollup is the only data-dependent shuffle.
    The moment pass is a bounded-metadata collect by construction
    (DIM*(DIM+1) cells, corpus-independent)."""
    import re

    df = QUERIES["embedding_anisotropy_abtt"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    for m in re.finditer(r"Exchange (\w+partitioning)\(([^)]*)\)", plan):
        assert "vec_id" not in m.group(2), plan


def test_abtt_g6_mirrors_engine_rounding(spark, duck):
    """The driver-side grid (shortest-repr + HALF_UP) against BOTH
    engines' round(x, 6) on the adversarial cases where Python round()
    (half-to-even) and exact-binary HALF_UP each diverge from the
    engines: representable decimal halves (0.1015625) and values whose
    shortest repr is a half but whose binary value sits below it
    (0.1234565)."""
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    cases = [0.1015625, -0.1015625, 0.1234565, -0.1234565, 2.5e-7,
             -2.5e-7, 1 / 3, -1 / 3, 0.9999995, 13 / 128]
    mirrored = [abtt_g6(x) for x in cases]
    duck_vals = [
        duck.sql(f"SELECT round(CAST({x!r} AS DOUBLE), 6) + 0.0").fetchone()[0]
        for x in cases
    ]
    spark_vals = list(
        spark.sql(
            "SELECT "
            + ", ".join(f"round(CAST({x!r} AS DOUBLE), 6) + 0.0" for x in cases)
        ).collect()[0]
    )
    assert mirrored == duck_vals == spark_vals
    # and the cases are genuinely adversarial: python round() gets two wrong
    assert round(0.1015625, 6) != abtt_g6(0.1015625)
    assert round(0.1234565, 6) != abtt_g6(0.1234565)


def test_abtt_moment_pass_is_arrow_batched_partials(spark):
    """The r14 respell's scale contract (the r13 verdict's one
    rising-with-scale ratio): the moment pass must reduce each Arrow
    batch to ONE flat partial inside MapInPandas — no per-row dim²
    product array through the row pipeline (the old fused-Generate
    spelling), so the only Generate explodes per-BATCH partials and the
    cell fold is a map-side-combined 4161-key sum."""
    from mapreduceindex_demo_spark.plans.vector_ops import (
        _ABTT_DIM,
        _abtt_moment_sums,
    )
    from mapreduceindex_demo_spark.session import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, PARITY_SF_DIR, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("ee")
    )
    df = _abtt_moment_sums(e)
    rows = df.collect()
    # exactly dim*(dim+1)+1 cells, and the count cell equals the corpus size
    assert len(rows) == _ABTT_DIM * (_ABTT_DIM + 1) + 1
    n = {r.p: r.s for r in rows}[_ABTT_DIM * _ABTT_DIM + _ABTT_DIM]
    assert n == e.count()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert "MapInPandas" in plan, plan
    # the per-row outer-product lambda chain is gone from the plan
    assert "transform(ee" not in plan.replace(" ", ""), plan
    # one Generate (the per-batch posexplode), sitting ABOVE MapInPandas
    assert plan.count("Generate") == 1, plan
    assert plan.index("Generate") < plan.index("MapInPandas"), plan
    # the cell fold partial-aggregates map-side before the 4161-key exchange
    assert "partial_sum" in plan, plan
