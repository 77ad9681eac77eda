"""Independent recomputations and plan contracts for the round-14
published-method operators: interpolated Kneser-Ney bigram scoring
([q:text_kneser_ney_bigram]), winnowing fingerprints
([q:dedup_winnowing_pairs]), the Heaps-law vocabulary-growth fit
([q:text_heaps_law_fit]), label-propagation communities
([q:graph_label_propagation]), nDCG@10 retrieval evaluation
([q:similarity_ndcg_eval]), and WordPiece tokenizer training
([q:text_wordpiece_train_merges])."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _docs(cols):
    t = pq.read_table(f"{PARITY_SF_DIR}/documents.parquet", columns=cols)
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_kneser_ney_matches_pure_python_lm(spark):
    """The full interpolated-KN chain — bigram/history/continuation
    counts, D=0.75 absolute discounting, the continuation-unigram
    backoff, per-source mean NLP and backoff share — re-derived in pure
    Python over the same corpus. Counts compare exactly; the two served
    means to within the 6-dp grid's n*eps band."""
    rows = _docs(["doc_id", "source", "text"])
    c2: Counter = Counter()
    events = []
    for doc_id, source, text in rows:
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            events.append((doc_id, source, a, b))
    c1: Counter = Counter()
    n1pf: Counter = Counter()
    n1pb: Counter = Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1pf[a] += 1
        n1pb[b] += 1
    tt = len(c2)
    agg = defaultdict(lambda: [set(), 0, 0.0, 0.0])
    for doc_id, source, a, b in events:
        p = ((c2[(a, b)] - 0.75) + 0.75 * n1pf[a] * (n1pb[b] / tt)) / c1[a]
        bsh = (0.75 * n1pf[a] * (n1pb[b] / tt) / c1[a]) / p
        assert 0.0 < p <= 1.0 + 1e-12
        st = agg[source]
        st[0].add(doc_id)
        st[1] += 1
        st[2] += -math.log(p)
        st[3] += bsh
    got = {
        r.source: r
        for r in QUERIES["text_kneser_ney_bigram"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for s, st in agg.items():
        r = got[s]
        assert r.n_docs == len(st[0])
        assert r.n_bigrams == st[1]
        assert abs(r.avg_neg_logprob - st[2] / st[1]) < 2e-6
        assert abs(r.backoff_share - st[3] / st[1]) < 2e-6
        # the KN-specific signal is alive: backoff mass is neither zero
        # nor dominant on a same-corpus scoring pass
        assert 0.0 < r.backoff_share < 0.5


def test_kneser_ney_lm_tables_are_vocabulary_scoped(spark):
    """Scale contract: the history/continuation/total tables derive from
    the gram-count table (vocabulary-sized), the event stream is folded
    to (source, gram) counts MAP-SIDE before any join (partial_count
    below the exchange), and NO exchange anywhere is keyed on doc_id —
    the gram stream never enters a join."""
    import re

    df = QUERIES["text_kneser_ney_bigram"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    for m in re.finditer(r"Exchange (\w+partitioning)\(([^)]*)\)", plan):
        assert "doc_id" not in m.group(2), plan
    assert "partial_count" in plan, plan
    # scoring joins broadcast the LM tables at parity SF (planner choice)
    assert "SortMergeJoin" not in plan, plan


def _py_winnow(text: str, k: int, w: int):
    """Reference winnowing (Schleimer et al. 2003, fig. 5 semantics):
    min hash per window, rightmost occurrence on ties."""
    t = text.lower()
    n = len(t)
    if n < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n - k + 1)
    ]
    sel = set()
    for ws in range(len(hs) - w + 1):
        win = hs[ws : ws + w]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, v in enumerate(win) if v == m)
        sel.add((ws + off, m))
    return {h for _, h in sel}


def test_winnowing_matches_pure_python_reference(spark):
    from mapreduceindex_demo_spark.plans.corpus_ops import (
        _WIN_K,
        _WIN_PB,
        _WIN_TOPN,
        _WIN_W,
    )

    from mapreduceindex_demo_spark.plans.corpus_ops import _WIN_MAXDF

    rows = _docs(["doc_id", "text"])
    # packing precondition: positions fit under 2^20
    assert max(len(t) for _, t in rows) < _WIN_PB
    raw_fps = {d: _py_winnow(t, _WIN_K, _WIN_W) for d, t in rows}
    by_hash = defaultdict(list)
    for d, s in raw_fps.items():
        for h in s:
            by_hash[h].append(d)
    # the MOSS hot-fingerprint cap: boilerplate hashes (df > maxdf) are
    # ignored by index, sizes, and pairs alike
    by_hash = {h: ds for h, ds in by_hash.items() if len(ds) <= _WIN_MAXDF}
    fps = defaultdict(set)
    for h, ds in by_hash.items():
        for d in ds:
            fps[d].add(h)
    pair_counts: Counter = Counter()
    for h, ds in by_hash.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_counts[(ds[i], ds[j])] += 1
    # the cap genuinely binds on this repetitive 31-word corpus
    assert sum(len(s) for s in fps.values()) < sum(
        len(s) for s in raw_fps.values()
    )
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    ranked = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    # abtt_g6, not Python round(): the engines round HALF_UP on the
    # shortest repr (the r13 ADVICE class)
    expected = [
        (
            a,
            b,
            c,
            len(fps[a]),
            len(fps[b]),
            abtt_g6(c / min(len(fps[a]), len(fps[b]))),
        )
        for (a, b), c in ranked[:_WIN_TOPN]
    ]
    got = [
        (r.doc_a, r.doc_b, r.shared_fps, r.fps_a, r.fps_b, r.containment)
        for r in QUERIES["dedup_winnowing_pairs"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # the corpus's exact dups surface as full-containment pairs
    assert got[0][5] == 1.0
    # winnowing density ~ 2/(w+1): the fingerprint sets are a real
    # compression of the k-gram stream, not the whole stream
    tot_fps = sum(len(s) for s in raw_fps.values())
    tot_grams = sum(max(len(t) - _WIN_K + 1, 0) for _, t in rows)
    assert tot_fps < 0.8 * tot_grams


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """The paper's guarantee: two docs sharing a substring of length
    >= w + k - 1 = 11 share at least one fingerprint hash. Synthesized
    adversarially: a 11-char common core embedded in different
    contexts."""
    from mapreduceindex_demo_spark.plans.corpus_ops import _WIN_K, _WIN_W

    core = "abcdefghijk"  # exactly k + w - 1 chars
    d1 = "xxxx" + core + "yyyyzz"
    d2 = "qrstuv" + core + "mnop"
    f1 = _py_winnow(d1, _WIN_K, _WIN_W)
    f2 = _py_winnow(d2, _WIN_K, _WIN_W)
    assert f1 & f2, "guarantee violated: no shared fingerprint"


def test_heaps_fit_matches_pure_python(spark):
    """The Heaps-law chain — integer ceil-division checkpoint buckets,
    exact prefix sums, the shared least-squares spelling — re-derived in
    pure Python; counts exact, fit within the grid band."""
    from mapreduceindex_demo_spark.plans.corpus_ops import _HEAPS_CP

    rows = _docs(["doc_id", "text"])
    mx = max(d for d, _ in rows)
    tok_b = Counter()
    first = {}
    for doc_id, text in rows:
        k = max(1, (_HEAPS_CP * doc_id + mx - 1) // mx)
        ws = text.split(" ")
        tok_b[k] += len(ws)
        for t in ws:
            if t not in first or doc_id < first[t]:
                first[t] = doc_id
    new_b = Counter(
        max(1, (_HEAPS_CP * fd + mx - 1) // mx) for fd in first.values()
    )
    pts = []
    n = v = 0
    for k in range(1, _HEAPS_CP + 1):
        n += tok_b.get(k, 0)
        v += new_b.get(k, 0)
        if n >= 1 and v >= 1:
            pts.append((n, v))
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    nn = float(len(pts))
    xs = [math.log(n) for n, _ in pts]
    ys = [math.log(v) for _, v in pts]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    beta = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    lnk = (sy - beta * sx) / nn
    # mirror the engines' grid-rounded nullif guard: a variance that is
    # ANALYTICALLY zero leaves only fp residue in the sums, which the
    # 6-dp round maps to exact 0 -> r2 is served NULL (this corpus's
    # vocabulary saturates in the first prefix, so the y-variance IS
    # analytically zero — the guard's live branch)
    r2_den = abtt_g6((nn * sxx - sx * sx) * (nn * syy - sy * sy))
    r2 = (
        None
        if r2_den == 0.0
        else ((nn * sxy - sx * sy) ** 2) / r2_den
    )
    [row] = QUERIES["text_heaps_law_fit"].fn(spark, PARITY_SF_DIR).collect()
    assert row.n_points == len(pts)
    assert row.total_tokens == pts[-1][0]
    assert row.total_terms == pts[-1][1]
    assert abs(row.heaps_beta - beta) < 2e-6
    assert abs(row.heaps_ln_k - lnk) < 2e-6
    if r2 is None:
        assert row.fit_r2 is None
    else:
        assert abs(row.fit_r2 - r2) < 2e-6
    # the alarm branch: this synthetic corpus's 31-word vocabulary is
    # exhausted in the FIRST prefix, so growth is fully saturated —
    # beta reads ~0 on the 6-dp grid and r2 is NULL (zero vocabulary
    # variance), exactly what the diagnostic flags
    assert 0.0 <= row.heaps_beta < 0.5
    assert row.total_terms < 100
    assert row.fit_r2 is None


def test_heaps_checkpoint_table_is_constant_sized(spark):
    """Scale contract: the cumulative window runs over the 16-row
    checkpoint table (its input subtree is the range + two bucket
    aggregates), never the corpus; and no exchange is keyed on
    doc_id."""
    import re

    df = QUERIES["text_heaps_law_fit"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    for m in re.finditer(r"Exchange (\w+partitioning)\(([^)]*)\)", plan):
        assert "doc_id" not in m.group(2), plan
    assert "Window" in plan, plan
    # the window's input is the checkpoint Range join, not a parquet scan
    below_window = plan.split("Window", 1)[1]
    assert "Range (1" in below_window, plan


def _trade_edges():
    o = pq.read_table(
        f"{PARITY_SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = dict(
        zip(o.column("o_orderkey").to_pylist(), o.column("o_custkey").to_pylist())
    )
    li = pq.read_table(
        f"{PARITY_SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    raw = {
        (f"c{cust[ok]}", f"s{sk}")
        for ok, sk in zip(
            li.column("l_orderkey").to_pylist(), li.column("l_suppkey").to_pylist()
        )
        if ok in cust
    }
    return raw | {(v, u) for u, v in raw}


def test_label_propagation_matches_pure_python(spark):
    """The deterministic synchronous-LPA trajectory re-derived in pure
    Python: plurality label per node with (count DESC, label ASC)
    tie-break, 4 rounds, top-20 community report — compared exactly
    (everything is integer counts over string labels)."""
    from mapreduceindex_demo_spark.plans.graph_queries import (
        _LPA_ROUNDS,
        _LPA_TOPN,
    )

    edges = _trade_edges()
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[v].append(u)
    labels = {n: n for n in nbrs}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for node, ins in nbrs.items():
            cnt = Counter(labels[u] for u in ins)
            nxt[node] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        labels = nxt
    comm = defaultdict(list)
    for node, lb in labels.items():
        comm[lb].append(node)
    rows = sorted(
        (
            (
                lb,
                len(ms),
                sum(1 for m in ms if m[0] == "c"),
                sum(1 for m in ms if m[0] == "s"),
                min(ms),
            )
            for lb, ms in comm.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:_LPA_TOPN]
    got = [
        (r.community, r.n_members, r.n_customers, r.n_suppliers, r.min_member)
        for r in QUERIES["graph_label_propagation"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == rows
    # propagation genuinely merged labels: fewer communities than nodes
    assert len(comm) < len(nbrs)
    assert got[0][1] >= 2
    # the two-mode invariant: after an EVEN number of synchronous rounds
    # on a bipartite graph, labels are side-pure (customer labels have
    # customer origins, supplier labels supplier origins), so every
    # community is single-sided — the split columns make this visible
    for _, n, nc, ns, _ in got:
        assert n == nc or n == ns


def test_ndcg_matches_pure_python(spark):
    """The nDCG chain — rounded-cosine ranking, graded gains, the shared
    DCG term, ideal normalization — re-derived in pure Python (cosines
    folded in the same in-order sequence, rounded on the engine grid via
    abtt_g6)."""
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    t = pq.read_table(f"{PARITY_SF_DIR}/embeddings.parquet")
    rows = list(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("label").to_pylist(),
            t.column("embedding").to_pylist(),
        )
    )

    def fold_cosine(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return abtt_g6(s / (math.sqrt(na) * math.sqrt(nb)))

    qs = [(v, l, e) for v, l, e in rows if v < 5]
    corpus = [(v, l, e) for v, l, e in rows if v >= 5]
    expected = []
    for qid, qlabel, qe in sorted(qs):
        graded = [
            (vid, max(0, 2 - abs(l - qlabel)), fold_cosine(e, qe))
            for vid, l, e in corpus
        ]
        byscore = sorted(graded, key=lambda x: (-x[2], x[0]))[:10]
        byideal = sorted(graded, key=lambda x: (-x[1], x[0]))[:10]
        dcg = sum(
            (2.0 ** g - 1.0) / math.log2(r + 2)
            for r, (_, g, _) in enumerate(byscore)
        )
        idcg = sum(
            (2.0 ** g - 1.0) / math.log2(r + 2)
            for r, (_, g, _) in enumerate(byideal)
        )
        expected.append((qid, qlabel, dcg, idcg, dcg / idcg))
    got = [
        (r.qid, r.qlabel, r.dcg_at_10, r.idcg_at_10, r.ndcg_at_10)
        for r in QUERIES["similarity_ndcg_eval"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert [g[:2] for g in got] == [e[:2] for e in expected]
    for g, e in zip(got, expected):
        assert abs(g[2] - e[2]) < 2e-6
        assert abs(g[3] - e[3]) < 2e-6
        assert abs(g[4] - e[4]) < 2e-6
        # nDCG is a genuine ratio in (0, 1]: the retriever is neither
        # perfect nor useless on the synthetic labels
        assert 0.0 < g[4] <= 1.0
    assert any(g[4] < 1.0 for g in got)


def test_ndcg_plan_scans_corpus_once(spark):
    """r14 verdict item 5: the two-window spelling re-ran the corpus
    scan + 5-query cosine fan-out once per window (DCG + IDCG). The
    single-pass respelling computes both row_numbers over the SAME
    graded frame — both windows share the qid partition key, so the
    plan is one embeddings scan feeding one qid exchange and two
    in-partition sorts."""
    df = QUERIES["similarity_ndcg_eval"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # exactly ONE corpus-side scan (vec_id >= 5); the other scans are
    # the pushed-down 5-row query-panel reads (vec_id < 5)
    assert plan.count("GreaterThanOrEqual(vec_id,5)") == 1, plan
    assert plan.count("Scan parquet") <= 3, plan
    # exactly one qid exchange feeds both window sorts
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning\(qid", plan)) == 1, plan
    assert plan.count("Window") >= 2, plan


def test_wordpiece_matches_pure_python_and_diverges_from_bpe(spark):
    """The WordPiece trainer re-derived in pure Python: per-round
    weighted pair/symbol counts, the likelihood-ratio argmax with
    (score DESC, pair ASC) tie-break, greedy rewrite — compared exactly
    (counts are integers; scores re-rounded on the engine grid). And the
    published divergence must be real on this corpus: the WordPiece
    merge table differs from the BPE one."""
    from mapreduceindex_demo_spark.plans.corpus_ops import _WP_MERGES
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6
    from tests.test_tokenizer_bpe import _greedy_rewrite, _python_bpe

    words = Counter()
    for _, text in _docs(["doc_id", "text"]):
        words.update(text.split(" "))
    seqs = Counter()
    for w, c in words.items():
        seqs[" ".join(list(w)) + " </w>"] += c
    expected = []
    for rank in range(1, _WP_MERGES + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for s, c in seqs.items():
            syms = s.split(" ")
            for sym in syms:
                sc[sym] += c
            for x, y in zip(syms, syms[1:]):
                pc[f"{x} {y}"] += c
        best = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (sc[kv[0].split(" ")[0]] * sc[kv[0].split(" ")[1]])),
                kv[0],
            ),
        )
        a, b = best[0].split(" ")
        expected.append(
            (rank, best[0], best[1], sc[a], sc[b],
             abtt_g6(best[1] / (sc[a] * sc[b])))
        )
        nxt = Counter()
        for s, c in seqs.items():
            nxt[_greedy_rewrite(s, best[0])] += c
        seqs = nxt
    got = [
        (r.merge_rank, r.pair, r.pair_count, r.left_count, r.right_count,
         r.score)
        for r in QUERIES["text_wordpiece_train_merges"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    ]
    assert got == expected
    bpe = [p for p, _ in _python_bpe(words, _WP_MERGES)]
    assert [g[1] for g in got] != bpe, (
        "WordPiece must diverge from BPE on this corpus"
    )


def test_winnowing_clusters_match_pure_python_union_find(spark):
    """The DECISION re-derived independently: strong edges by the exact
    integer SYMMETRIC-similarity rule, union-find components,
    (canonical, size, dropped) — compared exactly."""
    from mapreduceindex_demo_spark.plans.corpus_ops import (
        _WIN_CL_DEN,
        _WIN_CL_NUM,
        _WIN_K,
        _WIN_W,
    )

    from mapreduceindex_demo_spark.plans.corpus_ops import _WIN_MAXDF

    rows = _docs(["doc_id", "text"])
    raw_fps = {d: _py_winnow(t, _WIN_K, _WIN_W) for d, t in rows}
    by_hash = defaultdict(list)
    for d, s in raw_fps.items():
        for h in s:
            by_hash[h].append(d)
    by_hash = {h: ds for h, ds in by_hash.items() if len(ds) <= _WIN_MAXDF}
    fps = defaultdict(set)
    for h, ds in by_hash.items():
        for d in ds:
            fps[d].add(h)
    pair_counts: Counter = Counter()
    for h, ds in by_hash.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_counts[(ds[i], ds[j])] += 1
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    strong = []
    for (a, b), c in pair_counts.items():
        if _WIN_CL_DEN * c >= _WIN_CL_NUM * max(len(fps[a]), len(fps[b])):
            strong.append((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    members = defaultdict(set)
    for n in {n for e in strong for n in e}:
        members[find(n)].add(n)
    expected = sorted(
        ((min(ms), len(ms), len(ms) - 1) for ms in members.values()),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r.canonical_doc, r.cluster_size, r.n_dropped)
        for r in QUERIES["dedup_winnowing_clusters"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # the corpus's exact dups must form at least one real (>=2) cluster,
    # and the threshold genuinely prunes: strong edges < all pairs
    assert any(s >= 2 for _, s, _ in got)
    assert len(strong) < len(pair_counts)


def test_soft_dedup_weights_match_pure_python(spark):
    """The SoftDedup chain — bigram corpus LM on the micro integer grid,
    per-doc exact sums, the exp reweighting, per-source exact
    aggregates — re-derived in pure Python. Integer columns compare
    exactly; the ratio on the abtt_g6 grid. Property checks: by Jensen
    the GLOBAL effective ratio is >= 1 while the dup-heavy sources sit
    below their rare peers (the reweighting genuinely discriminates)."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    rows = _docs(["doc_id", "source", "text"])
    c2: Counter = Counter()
    per_doc = {}
    for doc_id, source, text in rows:
        ws = text.split(" ")
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        per_doc[doc_id] = (source, grams)
        c2.update(grams)
    tt = sum(c2.values())

    def half_away(x):
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    lpm = {g: half_away(math.log(c / tt) * 1_000_000) for g, c in c2.items()}
    docs = {
        d: (src, len(gs), sum(lpm[g] for g in gs))
        for d, (src, gs) in per_doc.items()
        if gs
    }
    corpus_mean = sum(s for _, _, s in docs.values()) / sum(
        n for _, n, _ in docs.values()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, n, s in docs.values():
        w = half_away(
            math.exp(-0.5 * (s / n - corpus_mean) / 1_000_000.0) * 1_000_000
        )
        a = agg[src]
        a[0] += 1
        a[1] += n
        a[2] += w
        a[3] += w * n
    expected = {
        src: (v[0], v[1], v[2], v[3], abtt_g6(v[3] / (1_000_000.0 * v[1])))
        for src, v in agg.items()
    }
    got = {
        r.source: (
            r.n_docs,
            r.raw_grams,
            r.weight_mass_micro,
            r.effective_grams_micro,
            r.effective_ratio,
        )
        for r in QUERIES["curation_soft_dedup_weights"]
        .fn(spark, PARITY_SF_DIR)
        .collect()
    }
    assert got == expected
    ratios = [v[4] for v in got.values()]
    tot_eff = sum(v[3] for v in got.values())
    tot_raw = sum(v[1] for v in got.values())
    assert tot_eff / (1_000_000.0 * tot_raw) >= 1.0  # Jensen
    assert max(ratios) > min(ratios)  # the weighting discriminates
