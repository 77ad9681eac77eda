"""Round-16 operator tests: the onion short-doc guard + persist fixes
(r15 ADVICE + verdict #1), then the round's new operators (unigram-LM
tokenizer, ExactSubstr dedup) — each re-derived in pure Python (the
engine-independent third implementation beside the Spark plan and the
DuckDB oracle) plus plan-shape contracts."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))


# --------------------------------------------------------------------------
# dedup_onion_chunk_gate — r16 fixes
# --------------------------------------------------------------------------


def test_onion_short_doc_parity(spark, tmp_path):
    """r15 ADVICE: a <8-token document must emit ZERO chunks on both
    engines. The unguarded Spark spelling evaluated sequence(1, 0) =
    [1, 0] (descending) and emitted two phantom chunks — one
    partial-width, one negative-start slice — while the oracle's
    range(1, 1) is empty. Side-by-side on a corpus whose minimum doc is
    BELOW the chunk width (driver testdata's minimum is 10 tokens, so
    the sf-dir parity gate can never catch this class)."""
    eight = " ".join(f"tok{i}" for i in range(8))
    rows = [
        ("d1", "only five words right here", "web"),  # 5 tokens: no chunks
        ("d2", eight, "web"),  # exactly one chunk
        ("d3", eight + " tail words beyond the chunk", "web"),  # dup chunk
        ("d4", " ".join(f"w{i}" for i in range(13)), "books"),  # 1 chunk
        ("d5", "", "books"),  # degenerate: 1 empty token
    ]
    _write_docs(tmp_path, rows)
    q = QUERIES["dedup_onion_chunk_gate"]
    got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    con.close()
    assert got == exp
    # d1/d5 are invisible; d2+d3 share one duplicated chunk; d4 is clean
    assert got == sorted(
        [("web", 2, 2, 2, 2, 1.0), ("books", 1, 1, 0, 0, 0.0)]
    )


def test_onion_chunk_frame_persisted_single_corpus_scan(spark):
    """r15 verdict #1: the exploded chunk-hash frame feeds BOTH the
    chunk-frequency groupBy and the verdict join — unpersisted, the
    second reader re-chunked the whole corpus (scan + split + md5 per
    chunk, twice). The executed plan must serve at least one reader from
    the cache (InMemoryTableScan) and keep the scan-local contract."""
    df = QUERIES["dedup_onion_chunk_gate"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------------------------------------
# text_unigram_lm_tokenizer
# --------------------------------------------------------------------------


def _uni_viterbi_py(w, lp):
    """Pure-Python Viterbi over the integer micro-log-prob grid: max
    score, ties to the smallest piece length — the (score, -l) max both
    engines implement."""
    n = len(w)
    best = [0] + [None] * n
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        cands = []
        for l in range(1, 5):
            if j >= l and w[j - l : j] in lp:
                cands.append((best[j - l] + lp[w[j - l : j]], -l))
        s, nl = max(cands)
        best[j], bp[j] = s, -nl
    ps, pos = [], n
    while pos > 0:
        l = bp[pos]
        ps.append(w[pos - l : pos])
        pos -= l
    return ps


def _uni_train_py(wf):
    """Pure-Python twin of the shared training chain: seed -> hard-EM
    round -> prune + add-one refit; returns the final micro-ln vocab."""
    import math
    from collections import Counter

    from mapreduceindex_demo_spark.oracle_harness import engine_round

    subs = Counter()
    for w, cnt in wf.items():
        for i in range(len(w)):
            for l in range(1, 5):
                if i + l <= len(w):
                    subs[w[i : i + l]] += cnt
    top0 = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    v0 = dict(top0)
    v0.update({p: c for p, c in subs.items() if len(p) == 1})
    tot0 = sum(v0.values())
    lp0 = {
        p: int(engine_round(math.log(c / float(tot0)) * 1_000_000, 0))
        for p, c in v0.items()
    }
    c1 = Counter()
    for w, cnt in wf.items():
        for piece in _uni_viterbi_py(w, lp0):
            c1[piece] += cnt
    v0c = {p: c1.get(p, 0) for p in v0}
    top1 = sorted(v0c.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
    v1 = dict(top1)
    v1.update({p: c for p, c in v0c.items() if len(p) == 1})
    tot1, nv = sum(v1.values()), len(v1)
    return {
        p: int(engine_round(math.log((c + 1.0) / float(tot1 + nv)) * 1_000_000, 0))
        for p, c in v1.items()
    }


def test_unigram_lm_matches_pure_python(spark):
    from collections import Counter

    import pyarrow.parquet as pq

    from mapreduceindex_demo_spark.oracle_harness import engine_round

    texts = (
        pq.read_table(f"{PARITY_SF_DIR}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    lp1 = _uni_train_py(wf)
    c2 = Counter()
    for w, cnt in wf.items():
        for piece in _uni_viterbi_py(w, lp1):
            c2[piece] += cnt
    served = {p: c2.get(p, 0) for p in lp1}
    tot2 = sum(served.values())
    head = sorted(served.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    expected = [
        (i + 1, p, len(p), c, engine_round(c / float(tot2), 6))
        for i, (p, c) in enumerate(head)
    ]
    got = [
        (r.piece_rank, r.piece, r.piece_len, r.cnt, r.prob)
        for r in QUERIES["text_unigram_lm_tokenizer"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # the learned vocabulary is a real subword table: multi-char pieces
    # must surface in the head, and probabilities sum below 1
    assert any(r[2] > 1 for r in got)
    assert sum(r[4] for r in got) < 1.0


def test_unigram_lm_plan_corpus_once_scan_local_dp(spark):
    """Scale contract: the corpus is touched ONCE (the persisted
    word-type exchange — every later stage rides InMemoryTableScan);
    the Viterbi DP is an in-row fold, so the only Window in the plan is
    the final 30-row rank, and no cartesian appears (the vocab
    crossJoins are 1-row-aggregate broadcast pairs)."""
    df = QUERIES["text_unigram_lm_tokenizer"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------------------------------------
# dedup_exactsubstr_spans
# --------------------------------------------------------------------------


def test_exactsubstr_matches_pure_python(spark):
    import hashlib
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from mapreduceindex_demo_spark.oracle_harness import engine_round

    L = 8
    t = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    rows = list(
        zip(*[t.column(c).to_pylist() for c in ("doc_id", "text", "source")])
    )
    grams = []  # (doc_id, source, pos, hash)
    freq = Counter()
    doc_tokens = {}
    for doc_id, text, source in rows:
        w = text.split(" ")
        doc_tokens[doc_id] = (source, len(w))
        for k in range(len(w) - L + 1):
            h = hashlib.md5(" ".join(w[k : k + L]).encode()).hexdigest()
            grams.append((doc_id, source, k + 1, h))
            freq[h] += 1
    dpos = defaultdict(list)
    for doc_id, source, pos, h in grams:
        if freq[h] >= 2:
            dpos[(doc_id, source)].append(pos)
    per_source = defaultdict(lambda: [0, 0, 0])  # affected, spans, removed
    for (doc_id, source), ps in dpos.items():
        ps.sort()
        spans = []
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev <= L:
                prev = p
            else:
                spans.append((start, prev))
                start = prev = p
        spans.append((start, prev))
        a = per_source[source]
        a[0] += 1
        a[1] += len(spans)
        a[2] += sum(e - s + L for s, e in spans)
    totals = defaultdict(lambda: [0, 0])  # docs, tokens
    for doc_id, (source, nt) in doc_tokens.items():
        totals[source][0] += 1
        totals[source][1] += nt
    expected = sorted(
        (
            s,
            totals[s][0],
            totals[s][1],
            per_source[s][0],
            per_source[s][1],
            per_source[s][2],
            engine_round(per_source[s][2] / float(totals[s][1]), 6),
        )
        for s in totals
    )
    got = [
        (
            r.source,
            r.n_docs,
            r.total_tokens,
            r.docs_affected,
            r.n_spans,
            r.removed_tokens,
            r.removed_ratio,
        )
        for r in QUERIES["dedup_exactsubstr_spans"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # duplicated mass exists (template floods) but removal is partial
    assert any(r[5] > 0 for r in got)
    assert all(r[5] < r[2] for r in got)


def test_exactsubstr_interval_merge_no_double_count(spark, tmp_path):
    """Two duplicated grams whose coverage overlaps (gap < L) must merge
    into ONE maximal span counted once — the run-id trick with step-1
    consecutiveness would double-count overlap. Built corpus: positions
    1 and 3 both duplicated with L=8 -> one span of 10 tokens."""
    import duckdb

    base = [f"w{i}" for i in range(10)]  # 10 tokens: grams at pos 1,2,3
    rows = [
        ("a1", " ".join(base), "web"),
        # duplicate gram at pos 1 (tokens 0-7) via a doc holding them
        ("b1", " ".join(base[0:8]), "web"),
        # duplicate gram at pos 3 (tokens 2-9) via another doc
        ("b2", " ".join(base[2:10]), "web"),
        ("c1", " ".join(f"x{i}" for i in range(12)), "books"),  # clean
    ]
    _write_docs(tmp_path, rows)
    q = QUERIES["dedup_exactsubstr_spans"]
    got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    con.close()
    assert got == exp
    web = [r for r in got if r[0] == "web"][0]
    # a1: dup grams at pos 1 (shared with b1) and pos 3 (shared with b2),
    # gap 2 < L -> ONE merged span of 3-1+8 = 10 tokens; b1/b2 each one
    # 8-token span. 3 docs affected, 3 spans, 10+8+8 = 26 removed tokens.
    assert (web[3], web[4], web[5]) == (3, 3, 26)


def test_exactsubstr_plan_shape(spark):
    """Gram fan-out is scan-local; the gram frame is persisted for its
    three readers; the interval merge is the only window (doc-keyed);
    no cartesian anywhere."""
    df = QUERIES["dedup_exactsubstr_spans"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_unigram_apply_fertility_matches_pure_python(spark):
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from mapreduceindex_demo_spark.oracle_harness import engine_round

    t = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["text", "source"]
    )
    rows = list(zip(t.column("text").to_pylist(), t.column("source").to_pylist()))
    wfs = Counter()
    for text, source in rows:
        for w in text.split(" "):
            if w:
                wfs[(source, w)] += 1
    wf = Counter()
    for (source, w), c in wfs.items():
        wf[w] += c
    lp1 = _uni_train_py(wf)
    np = {w: len(_uni_viterbi_py(w, lp1)) for w in wf}
    agg = defaultdict(lambda: [0, 0, 0])  # tokens, chars, pieces
    for (source, w), c in wfs.items():
        a = agg[source]
        a[0] += c
        a[1] += c * len(w)
        a[2] += c * np[w]
    expected = sorted(
        (
            s,
            a[0],
            a[1],
            a[2],
            engine_round(a[2] / float(a[0]), 6),
            engine_round(a[1] / float(a[2]), 6),
        )
        for s, a in agg.items()
    )
    got = [
        (
            r.source,
            r.n_tokens,
            r.n_chars,
            r.n_pieces,
            r.fertility,
            r.chars_per_piece,
        )
        for r in QUERIES["text_unigram_apply_fertility"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # a trained subword model segments BELOW character granularity but
    # above one piece per word: 1 <= fertility < chars_per_word
    for r in got:
        assert 1.0 <= r[4] < r[2] / float(r[1])


# --------------------------------------------------------------------------
# curation_ssl_prototypes / curation_d4_prune — the embedding-curation
# trio completers (Sorscher et al. 2022; Tirumala et al. 2023)
# --------------------------------------------------------------------------


def _fold_sum(vals):
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


def _train_and_rank(byid, corpus):
    """The IVF 6-dp Lloyd's contract in pure Python: seed with the first 8
    corpus vectors by vec_id, 2 iterations, then the SemDeDup member
    ranking. Returns {cid: [(vec_id, csim) ranked by (csim desc, id)]}.
    """
    import numpy as np

    seeds = sorted(corpus)[:8]
    cents = {cid: byid[cid] for cid in seeds}
    dim = len(next(iter(byid.values())))
    for _ in range(2):
        members = defaultdict(list)
        for v in corpus:
            best = max(cents, key=lambda c: (_cos6(byid[v], cents[c]), -c))
            members[best].append(v)
        cents = {
            cid: [
                engine_round(float(np.mean([byid[m][d] for m in mem])), 6)
                for d in range(dim)
            ]
            for cid, mem in members.items()
        }
    cells = defaultdict(list)
    for v in corpus:
        best = max(cents, key=lambda c: (_cos6(byid[v], cents[c]), -c))
        cells[best].append((v, _cos6(byid[v], cents[best])))
    return {
        cid: sorted(mem, key=lambda t2: (-t2[1], t2[0]))
        for cid, mem in cells.items()
    }


def _emb_byid():
    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    rows = sorted(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    byid = {v: [float(x) for x in e] for v, e in rows}
    return byid, [v for v, _ in rows if v != 0]


def test_ssl_prototypes_matches_python_cells(spark):
    byid, corpus = _emb_byid()
    ranked = _train_and_rank(byid, corpus)
    expected = []
    for cid in sorted(ranked):
        mem = ranked[cid]
        n = len(mem)
        npr = (n * 25) // 100
        pruned, kept = mem[:npr], mem[npr:]
        expected.append(
            (
                cid,
                n,
                npr,
                min((cs for _, cs in pruned), default=-1.0),
                max(cs for _, cs in kept),
                min(cs for _, cs in kept),
            )
        )
    got = [
        (
            r.cid,
            r.n_members,
            r.n_pruned,
            r.prune_floor_csim,
            r.keep_head_csim,
            r.hardest_kept_csim,
        )
        for r in QUERIES["curation_ssl_prototypes"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # the prune path is exercised and never empties a cell
    assert any(p > 0 for _, _, p, *_ in got)
    assert all(p < m for _, m, p, *_ in got)


def test_d4_funnel_matches_python(spark):
    byid, corpus = _emb_byid()
    # stage 1: SemDeDup on the full corpus (the r15 contract)
    ranked1 = _train_and_rank(byid, corpus)
    dropped = set()
    for mem in ranked1.values():
        for i, (va, _) in enumerate(mem):
            for vb, _ in mem[i + 1 :]:
                if _cos6(byid[va], byid[vb]) >= 0.3:
                    dropped.add(vb)
    surv = [v for v in corpus if v not in dropped]
    # stage 2: re-cluster the survivors, prune prototypes
    ranked2 = _train_and_rank(byid, surv)
    n_pruned = sum(
        (len(mem) * 25) // 100 for mem in ranked2.values()
    )
    expected = (
        len(corpus),
        8,
        len(dropped),
        len(surv),
        8,
        n_pruned,
        len(surv) - n_pruned,
    )
    rows = QUERIES["curation_d4_prune"].fn(spark, PARITY_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    got = (
        r.n_corpus,
        r.k_dedup,
        r.n_dup_dropped,
        r.n_after_dedup,
        r.k_recluster,
        r.n_proto_pruned,
        r.n_final,
    )
    assert got == expected
    # both stages bite: duplicates dropped AND prototypes pruned
    assert r.n_dup_dropped > 0 and r.n_proto_pruned > 0
    assert r.n_final == r.n_after_dedup - r.n_proto_pruned


def test_ssl_prototypes_plan_no_pair_join(spark):
    """Prototype pruning needs NO pair join — the plan must contain no
    cartesian product and no join wider than the k-row centroid
    broadcast (the cheap member of the embedding-curation family)."""
    df = QUERIES["curation_ssl_prototypes"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_d4_plan_no_cartesian(spark):
    """D4's only data-sized joins are the cid equi-join (stage-1 pairs)
    and the survivor anti-join; both training chains broadcast k rows."""
    df = QUERIES["curation_d4_prune"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------------------------------------
# similarity_hard_negatives — DPR/RocketQA negative mining
# --------------------------------------------------------------------------


def test_hard_negatives_matches_python_panel(spark):
    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    rows = sorted(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("label").to_pylist(),
            t.column("embedding").to_pylist(),
        )
    )
    byid = {v: ([float(x) for x in e], lb) for v, lb, e in rows}
    queries = [(v, byid[v]) for v in sorted(byid) if v < 5]
    corpus = [v for v in sorted(byid) if v >= 5]
    expected = []
    for qid, (qe, qlabel) in queries:
        scored = []
        for v in corpus:
            ee, lb = byid[v]
            g = max(0, 2 - abs(lb - qlabel))
            scored.append((v, _cos6(ee, qe), g))
        best_pos = max((cs for _, cs, g in scored if g > 0), default=-2.0)
        negs = sorted(
            ((v, cs) for v, cs, g in scored if g == 0),
            key=lambda t2: (-t2[1], t2[0]),
        )[:5]
        for rk, (v, cs) in enumerate(negs, start=1):
            expected.append(
                (
                    qid,
                    rk,
                    v,
                    cs,
                    engine_round(best_pos, 6),
                    1 if cs > best_pos else 0,
                )
            )
    got = [
        (
            r.qid,
            r.rank,
            r.neg_vec_id,
            r.neg_score,
            r.best_pos_score,
            r.above_best_positive,
        )
        for r in QUERIES["similarity_hard_negatives"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    assert len(got) == 25
    # the RocketQA denoising flag fires somewhere in the panel
    assert any(f == 1 for *_, f in got)


# --------------------------------------------------------------------------
# similarity_matryoshka_recall / sketch_kmv_distinct
# --------------------------------------------------------------------------


def test_matryoshka_recall_matches_python_panel(spark):
    byid, corpus = _emb_byid()
    queries = [v for v in sorted(byid) if v < 5]
    corpus = [v for v in corpus if v >= 5]
    top = {}
    for qid in queries:
        for d in (8, 16, 32, 64):
            scored = sorted(
                (
                    (v, _cos6(byid[v][:d], byid[qid][:d]))
                    for v in corpus
                ),
                key=lambda t2: (-t2[1], t2[0]),
            )[:10]
            top[(qid, d)] = [v for v, _ in scored]
    expected = []
    for qid in queries:
        truth = set(top[(qid, 64)])
        for d in (8, 16, 32):
            n = len(truth & set(top[(qid, d)]))
            expected.append((qid, d, n, engine_round(n / 10.0, 6)))
    got = [
        (r.qid, r.dim, r.n_overlap, r.recall_at_10)
        for r in QUERIES["similarity_matryoshka_recall"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # recall must be non-trivial somewhere and never exceed 1
    assert any(n > 0 for _, _, n, _ in got)
    assert all(0 <= n <= 10 for _, _, n, _ in got)


def test_kmv_matches_python_estimator(spark):
    import hashlib

    t = pq.read_table(f"{PARITY_SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    keys = sorted(set(t.column("l_orderkey").to_pylist()))
    us = sorted(
        int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) for k in keys
    )
    k = 256
    kept = us[:k]
    hk = kept[-1]
    n_exact = len(keys)
    n_est = n_exact if len(kept) < k else (k - 1) * 4294967296 // hk
    rows = QUERIES["sketch_kmv_distinct"].fn(spark, PARITY_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_exact, r.k, r.k_kept, r.kth_min_u32, r.n_est) == (
        n_exact,
        k,
        min(k, n_exact),
        hk,
        n_est,
    )
    assert r.rel_err_pct == engine_round(
        (float(n_est) - n_exact) * 100.0 / n_exact, 6
    )
    # the estimator is in the right ballpark (KMV sigma ~ 1/sqrt(k) ~ 6%)
    assert abs(r.rel_err_pct) < 25.0


# --------------------------------------------------------------------------
# text_mattr_diversity — Covington-McFall moving-average TTR
# --------------------------------------------------------------------------


def test_mattr_matches_python(spark):
    t = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["source", "text"]
    )
    per_source = defaultdict(list)
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        tk = text.split(" ")
        n = len(tk)
        w = min(25, n)
        nwin = n - w + 1
        s = sum(len(set(tk[i : i + w])) for i in range(nwin))
        micro = int(engine_round(1000000.0 * s / (float(w) * nwin), 0))
        per_source[src].append(micro)
    expected = []
    for src in sorted(per_source):
        ms = per_source[src]
        expected.append(
            (
                src,
                len(ms),
                engine_round(sum(ms) / (len(ms) * 1000000.0), 6),
                engine_round(min(ms) / 1000000.0, 6),
                engine_round(max(ms) / 1000000.0, 6),
            )
        )
    got = [
        (r.source, r.n_docs, r.mean_mattr, r.min_mattr, r.max_mattr)
        for r in QUERIES["text_mattr_diversity"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # diversity is a real signal: means sit strictly inside (0, 1]
    assert all(0.0 < m <= 1.0 for _, _, m, _, _ in got)


def test_mattr_plan_is_scan_local(spark):
    """The in-row fold contract: no explode-driven shuffle, no window
    function, no join — one scan + the |sources|-row rollup."""
    df = QUERIES["text_mattr_diversity"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate" not in plan, plan


# --------------------------------------------------------------------------
# graph_hits_hubs_auth — Kleinberg HITS, integer fixed point
# --------------------------------------------------------------------------


def test_hits_matches_python_integer_fixed_point(spark):
    lo = pq.read_table(
        f"{PARITY_SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    oo = pq.read_table(
        f"{PARITY_SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = dict(
        zip(oo.column("o_orderkey").to_pylist(), oo.column("o_custkey").to_pylist())
    )
    w = defaultdict(int)
    for ok, sk in zip(
        lo.column("l_orderkey").to_pylist(), lo.column("l_suppkey").to_pylist()
    ):
        if ok in cust:
            w[(f"c{cust[ok]}", f"s{sk}")] += 1
    scale = 10**6
    h = {u: 1 for u, _ in w}
    a = {}
    for _ in range(5):
        araw = defaultdict(int)
        for (u, v), wt in w.items():
            araw[v] += wt * h[u]
        tot = sum(araw.values())
        a = {v: (x * scale) // tot for v, x in araw.items()}
        hraw = defaultdict(int)
        for (u, v), wt in w.items():
            hraw[u] += wt * a[v]
        tot = sum(hraw.values())
        h = {u: (x * scale) // tot for u, x in hraw.items()}
    expected = []
    for side, scores in (("auth", a), ("hub", h)):
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        expected.extend(
            (side, n, s, engine_round(s / float(scale), 6)) for n, s in top
        )
    got = [
        (r.side, r.node, r.score_e6, r.score)
        for r in QUERIES["graph_hits_hubs_auth"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # both sides served, L1 mass on the grid (each side sums to ~scale
    # over ALL nodes, so the served top-10 mass is below it)
    assert {s for s, *_ in got} == {"auth", "hub"}
    assert all(0 < e6 <= scale for _, _, e6, _ in got)
