"""Independent (NumPy) recomputation checks for the round-7b vector
operators — a third implementation besides the Spark plan and the DuckDB
oracle, so a shared misconception between the two can't hide."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

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
        return round(num / den, 6)

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
            v: round(
                _MMR_LAMBDA * rel[v]
                - round(1 - _MMR_LAMBDA, 6) * max(sims[(v, p)] for p in picked),
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
