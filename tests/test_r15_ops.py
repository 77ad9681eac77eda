"""Round-15 operator tests: Moore-Lewis selection, UniMax budgets,
Good-Turing smoothing, onion chunk gating, RAKE + TextRank keywords, and
SemDeDup — each re-derived in pure Python/NumPy (the engine-independent
third implementation beside the Spark plan and the DuckDB oracle) plus
plan-shape contracts."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _docs(cols):
    t = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# --------------------------------------------------------------------------
# curation_moore_lewis_select
# --------------------------------------------------------------------------


def _micro_ln(x: float) -> int:
    return int(engine_round(math.log(x) * 1_000_000, 0))


def test_moore_lewis_matches_pure_python(spark):
    rows = _docs(["doc_id", "text", "lang"])
    ca: Counter = Counter()
    ci: Counter = Counter()
    per_doc = {}
    for doc_id, text, lang in rows:
        w = text.split(" ")
        grams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        if not grams:
            continue
        per_doc[doc_id] = (lang, grams)
        ca.update(grams)
        if lang == "en":
            ci.update(grams)
    ta, ti, v = sum(ca.values()), sum(ci.values()), len(ca)
    lpg = {g: _micro_ln((ca[g] + 1.0) / float(ta + v)) for g in ca}
    lpi = {g: _micro_ln((ci[g] + 1.0) / float(ti + v)) for g in ca}
    scored = []
    for doc_id, (lang, grams) in per_doc.items():
        n = len(grams)
        si = sum(lpi[g] for g in grams)
        sg = sum(lpg[g] for g in grams)
        scored.append(((sg - si) / float(n), doc_id, lang, n, si, sg))
    scored.sort(key=lambda t: (t[0], t[1]))
    expected = [
        (doc_id, lang, n, si, sg, engine_round(s / 1_000_000.0, 6))
        for s, doc_id, lang, n, si, sg in scored[:20]
    ]
    got = [
        (r.doc_id, r.lang, r.n_grams, r.sum_lp_in, r.sum_lp_gen, r.ml_score)
        for r in QUERIES["curation_moore_lewis_select"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # the selection must prefer English: in-domain docs dominate the head
    langs = [g[1] for g in got]
    assert langs.count("en") > len(langs) // 2


def test_moore_lewis_plan_one_vocab_exchange_broadcast_probe(spark):
    """ONE vocabulary exchange builds BOTH LMs (conditional aggregates);
    the scoring probe joins the persisted vocabulary table broadcast —
    no sort-merge join anywhere."""
    df = QUERIES["curation_moore_lewis_select"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# --------------------------------------------------------------------------
# curation_unimax_budgets
# --------------------------------------------------------------------------


def test_unimax_matches_sequential_water_filling(spark):
    """The engine's window/prefix closed form vs the paper's SEQUENTIAL
    loop (smallest source first: take the cap while it fits under an
    equal split of the remainder, else everyone left splits equally) —
    the prefix-collapse argument, validated element by element."""
    rows = _docs(["lang", "text"])
    tok: Counter = Counter()
    for lang, text in rows:
        tok[lang] += len(text.split(" "))
    total = sum(tok.values())
    budget, e = total * 3 // 2, 2
    ordered = sorted(tok.items(), key=lambda kv: (kv[1], kv[0]))
    alloc = {}
    remaining = budget
    for idx, (src, n) in enumerate(ordered):
        left = len(ordered) - idx
        cap = e * n
        if cap * left <= remaining:
            alloc[src] = cap
            remaining -= cap
        else:
            share = remaining // left
            for src2, n2 in ordered[idx:]:
                alloc[src2] = share
            break
    expected = sorted(
        (
            src,
            n,
            e * n,
            alloc[src],
            engine_round(alloc[src] / float(n), 6),
        )
        for src, n in tok.items()
    )
    got = [
        (r.lang, r.n_tokens, r.cap_tokens, r.alloc_tokens, r.epochs_served)
        for r in QUERIES["curation_unimax_budgets"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # conservation + cap: never over budget, never over N epochs, and the
    # budget is genuinely consumed (within one floor remainder per source)
    assert sum(a for *_, a, _ in got) <= budget
    assert all(a <= c for _, _, c, a, _ in got)
    assert sum(a for *_, a, _ in got) > budget - len(got)
    # both branches exercised: someone capped, someone on the equal share
    assert any(a == c for _, _, c, a, _ in got)
    assert any(a < c for _, _, c, a, _ in got)


# --------------------------------------------------------------------------
# text_good_turing_smoothing
# --------------------------------------------------------------------------


def test_good_turing_matches_python_counter(spark):
    rows = _docs(["text"])
    words: Counter = Counter()
    for (text,) in rows:
        w = text.split(" ")
        words.update(
            f"{a} {b} {c}" for a, b, c in zip(w, w[1:], w[2:])
        )
    nr = Counter(words.values())
    n = sum(words.values())
    p0 = engine_round(nr.get(1, 0) / float(n), 6)
    expected = sorted(
        (
            r,
            cnt,
            engine_round((r + 1) * nr.get(r + 1, 0) / float(cnt), 6),
            p0,
        )
        for r, cnt in nr.items()
        if r <= 10
    )
    got = [
        (r.r, r.n_r, r.r_star, r.unseen_p0)
        for r in QUERIES["text_good_turing_smoothing"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    assert 0.0 < p0 < 1.0  # singletons exist but are not the whole corpus


# --------------------------------------------------------------------------
# dedup_onion_chunk_gate
# --------------------------------------------------------------------------


def test_onion_matches_python_chunk_hashes(spark):
    rows = _docs(["doc_id", "text", "source"])
    chunks = []
    for doc_id, text, source in rows:
        w = text.split(" ")
        for k in range(len(w) // 8):
            h = hashlib.md5(
                " ".join(w[k * 8 : (k + 1) * 8]).encode()
            ).hexdigest()
            chunks.append((doc_id, source, h))
    docs_per_hash = defaultdict(set)
    for doc_id, _, h in chunks:
        docs_per_hash[h].add(doc_id)
    per_doc = defaultdict(lambda: [0, 0])
    src_of = {}
    for doc_id, source, h in chunks:
        per_doc[doc_id][0] += 1
        per_doc[doc_id][1] += 1 if len(docs_per_hash[h]) > 1 else 0
        src_of[doc_id] = source
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, (nc, dc) in per_doc.items():
        a = agg[src_of[doc_id]]
        a[0] += 1
        a[1] += nc
        a[2] += dc
        a[3] += 1 if 2 * dc > nc else 0
    expected = sorted(
        (s, a[0], a[1], a[2], a[3], engine_round(a[2] / float(a[1]), 6))
        for s, a in agg.items()
    )
    got = [
        (r.source, r.n_docs, r.n_chunks, r.dup_chunks, r.n_dropped,
         r.dup_ratio)
        for r in QUERIES["dedup_onion_chunk_gate"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    # duplicate chunks exist (the replicated-template corpus) but the
    # gate is not degenerate
    assert any(r[3] > 0 for r in got)


# --------------------------------------------------------------------------
# text_rake_keywords
# --------------------------------------------------------------------------


def test_rake_matches_pure_python(spark):
    rows = _docs(["text"])
    stops = {"a", "the"}
    phrases: Counter = Counter()
    freq: Counter = Counter()
    deg: Counter = Counter()
    for (text,) in rows:
        run: list[str] = []
        for tok in text.split(" ") + ["a"]:  # sentinel flushes the tail
            if tok in stops:
                if run:
                    phrases[" ".join(run)] += 1
                    for w in run:
                        freq[w] += 1
                        deg[w] += len(run)
                    run = []
            else:
                run.append(tok)
    wsc = {
        w: int(engine_round(deg[w] * 1_000_000.0 / freq[w], 0))
        for w in freq
    }
    scored = sorted(
        (
            (-sum(wsc[w] for w in p.split(" ")), p),
            (
                p,
                len(p.split(" ")),
                occ,
                sum(wsc[w] for w in p.split(" ")),
            ),
        )
        for p, occ in phrases.items()
    )
    expected = [
        (p, nw, occ, sm, engine_round(sm / 1_000_000.0, 6))
        for _, (p, nw, occ, sm) in scored[:20]
    ]
    got = [
        (r.phrase, r.n_words, r.occurrences, r.score_micro, r.rake_score)
        for r in QUERIES["text_rake_keywords"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # multi-word phrases must surface (the whole point of RAKE)
    assert any(r[1] > 1 for r in got)


# --------------------------------------------------------------------------
# text_textrank_keywords
# --------------------------------------------------------------------------


def test_textrank_matches_pure_python_integer_pagerank(spark):
    rows = _docs(["text"])
    stops = {"a", "the"}
    w_cnt: Counter = Counter()
    for (text,) in rows:
        toks = text.split(" ")
        for t1, t2 in zip(toks, toks[1:]):
            if t1 in stops or t2 in stops or t1 == t2:
                continue
            w_cnt[(min(t1, t2), max(t1, t2))] += 1
    out_edges = defaultdict(list)
    outw: Counter = Counter()
    for (a, b), w in w_cnt.items():
        out_edges[a].append((b, w))
        out_edges[b].append((a, w))
        outw[a] += w
        outw[b] += w
    nodes = sorted(outw)
    n, scale, damp = len(nodes), 10**12, 85
    base = ((100 - damp) * scale) // (100 * n)
    r = {u: scale // n for u in nodes}
    for _ in range(5):
        nxt = defaultdict(int)
        for u in nodes:
            for v, w in out_edges[u]:
                nxt[v] += (r[u] * damp * w) // (100 * outw[u])
        r = {u: base + nxt[u] for u in nodes}
    top = sorted(nodes, key=lambda u: (-r[u], u))[:10]
    expected = [
        (u, r[u], engine_round(r[u] / float(scale), 9)) for u in top
    ]
    got = [
        (row.keyword, row.rank_e12, row.rank)
        for row in QUERIES["text_textrank_keywords"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    assert not any(k in {"a", "the"} for k, _, _ in got)


# --------------------------------------------------------------------------
# dedup_semdedup_cells
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


def test_semdedup_matches_python_cells(spark):
    import numpy as np

    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    rows = sorted(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    byid = {v: [float(x) for x in e] for v, e in rows}
    corpus = [v for v, _ in rows if v != 0]
    cents = {cid: byid[cid] for cid in range(1, 9)}
    for _ in range(2):
        members = defaultdict(list)
        for v in corpus:
            best = max(cents, key=lambda c: (_cos6(byid[v], cents[c]), -c))
            members[best].append(v)
        cents = {
            cid: [
                engine_round(
                    float(np.mean([byid[m][d] for m in mem])), 6
                )
                for d in range(64)
            ]
            for cid, mem in members.items()
        }
    asg = {}
    for v in corpus:
        best = max(cents, key=lambda c: (_cos6(byid[v], cents[c]), -c))
        asg[v] = (best, _cos6(byid[v], cents[best]))
    cells = defaultdict(list)
    for v, (cid, cs) in asg.items():
        cells[cid].append((v, cs))
    expected = []
    for cid in sorted(cells):
        mem = sorted(cells[cid], key=lambda t2: (-t2[1], t2[0]))
        pairs, dropped = 0, set()
        for i, (va, _) in enumerate(mem):
            for vb, _ in mem[i + 1 :]:
                if _cos6(byid[va], byid[vb]) >= 0.3:
                    pairs += 1
                    dropped.add(vb)
        expected.append((cid, len(mem), pairs, len(dropped)))
    got = [
        (r.cid, r.n_members, r.n_dup_pairs, r.n_dropped)
        for r in QUERIES["dedup_semdedup_cells"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # the drop path is exercised but never empties a cell
    assert any(d > 0 for *_, d in got)
    assert all(d < m for _, m, _, d in got)


def test_semdedup_plan_no_cartesian(spark):
    """The in-cell pair join must be an equi-join on cid — the SemDeDup
    scale argument. A cartesian/broadcast-nested-loop pair join would be
    corpus x corpus."""
    df = QUERIES["dedup_semdedup_cells"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_rake_plan_is_scan_local_no_window(spark):
    """The r15 respell contract: phrase segmentation happens IN-ROW
    (boundary slicing), so the executed plan has NO Window operator and
    no cartesian — the first spelling's per-token run-id window paid a
    doc-partitioned exchange (and its oracle twin overran DuckDB's
    window buffers at ~sf3)."""
    df = QUERIES["text_rake_keywords"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_onion_plan_is_scan_local_chunking(spark):
    """Chunking is an in-row slice transform: no Window, no cartesian;
    the only corpus-sized move is the chunk-hash exchange."""
    df = QUERIES["dedup_onion_chunk_gate"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_unimax_plan_one_corpus_aggregate(spark):
    """ONE map-side-combined |languages|-row aggregate leaves the corpus
    scan; every window runs on the metadata-sized table (a corpus-sized
    window would show a hashpartitioning exchange on doc-cardinality
    keys). The plan must contain no join wider than a broadcast."""
    df = QUERIES["curation_unimax_budgets"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
