"""Spark-side invariants of the round-7b curation/search/index operators
(oracle parity itself is covered by tests/test_oracle_parity.py and the
driver gate — these check the properties parity can't see)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.plans.curation_ops import _TOKEN_BUDGET
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import PARITY_SF_DIR


def test_token_budget_never_exceeded_and_selection_nontrivial(spark):
    rows = QUERIES["curation_token_budget"].fn(spark, PARITY_SF_DIR).collect()
    assert rows, "no source selected anything"
    for r in rows:
        assert r.tokens_kept <= _TOKEN_BUDGET, r
        assert r.docs_kept >= 1
        assert 0.0 < r.budget_utilization <= 1.0
    total_docs = load_table(spark, PARITY_SF_DIR, "documents").count()
    # the budget binds: strictly fewer docs than the corpus are kept
    assert sum(r.docs_kept for r in rows) < total_docs


def test_token_budget_selection_is_resumable_prefix(spark):
    """Doubling the budget must KEEP every doc the smaller budget chose
    (selection order is a pure function of doc ids) — re-derive both
    selections with the query's own ordering rule and compare."""
    from pyspark.sql import Window

    d = load_table(spark, PARITY_SF_DIR, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ntok"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum", F.sum("ntok").over(w))
    small = {r.doc_id for r in cum.where(F.col("cum") <= _TOKEN_BUDGET).collect()}
    big = {
        r.doc_id for r in cum.where(F.col("cum") <= 2 * _TOKEN_BUDGET).collect()
    }
    assert small < big


def test_boilerplate_families_are_real_prefix_groups(spark):
    out = QUERIES["dedup_boilerplate_prefix"].fn(spark, PARITY_SF_DIR)
    rows = out.collect()
    assert rows, "generated corpus has exact dups, so prefix families exist"
    for r in rows:
        assert r.n_docs >= 2
        assert 1 <= r.n_sources <= r.n_docs
        assert r.min_doc <= r.max_doc


def test_snippet_contains_term_and_plan_is_scan_local(spark):
    q = QUERIES["search_snippet_highlight"]
    df = q.fn(spark, PARITY_SF_DIR)
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        assert "vector" in r.snippet.split(" ")
        assert r.tf >= 1 and r.first_pos >= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no explode (Generate) — token windowing is array-expression local;
    # top-k is the heap, not a global sort
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_c4_gate_counts_are_consistent(spark):
    rows = QUERIES["text_c4_style_gate"].fn(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.kept <= r.docs
        for f in (r.fail_short, r.fail_wordlen, r.fail_stopword, r.fail_diversity):
            assert 0 <= f <= r.docs
        # a doc failing any rule is not kept
        assert r.kept <= r.docs - max(
            r.fail_short, r.fail_wordlen, r.fail_stopword, r.fail_diversity
        )
        assert 0.0 <= r.retention <= 1.0
    # every rule discriminates somewhere in the corpus
    assert sum(r.fail_short for r in rows) > 0
    assert sum(r.fail_wordlen for r in rows) > 0
    assert sum(r.fail_stopword for r in rows) > 0
    assert sum(r.fail_diversity for r in rows) > 0


def test_scan_intersect_matches_direct_predicate(spark):
    got = {
        r.doc_id
        for r in QUERIES["mapindex_scan_intersect"].fn(spark, PARITY_SF_DIR).collect()
    }
    d = load_table(spark, PARITY_SF_DIR, "documents")
    want = {
        r.doc_id
        for r in d.where(
            (F.col("source") == "src3")
            & F.size(F.split(F.col("text"), " ")).between(25, 60)
        )
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_scan_union_matches_direct_predicate_and_dedupes(spark):
    got = [
        r.doc_id
        for r in QUERIES["mapindex_scan_union"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert len(got) == len(set(got)), "union scan must dedupe overlap"
    d = load_table(spark, PARITY_SF_DIR, "documents")
    want = {
        r.doc_id
        for r in d.where(
            (F.col("source") == "src3")
            | F.size(F.split(F.col("text"), " ")).between(80, 99)
        )
        .select("doc_id")
        .collect()
    }
    assert set(got) == want
    # the overlap is real: union output < sum of the two sides
    a = d.where(F.col("source") == "src3").count()
    b = d.where(F.size(F.split(F.col("text"), " ")).between(80, 99)).count()
    assert len(got) < a + b


def _py_dsir_expected(rows, B, topk):
    """Pure-Python DSIR mirror: hashed-bucket unigram LMs (target =
    lang='en', raw = all), per-bucket micro-unit integer log-ratio, doc
    weights as exact integer sums — the same grid the query computes on,
    so the comparison is exact, not approximate."""
    import hashlib
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    cs: Counter = Counter()
    ct: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    meta: dict[int, tuple] = {}
    for doc_id, text, lang, source in rows:
        c = Counter(bucket(w) for w in text.split(" "))
        per_doc[doc_id] = c
        meta[doc_id] = (source, lang)
        cs.update(c)
        if lang == "en":
            ct.update(c)
    ns, nt = sum(cs.values()), sum(ct.values())
    lr = {}
    for b in cs:
        x = (
            math.log(ct.get(b, 0) + 1)
            - math.log(cs[b] + 1)
            + math.log(ns + B)
            - math.log(nt + B)
        )
        # HALF_UP mirror of round(x*1e6, 0) (engines round halves away
        # from zero; Python round() is half-even)
        lr[b] = int(
            Decimal(x * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
    scored = []
    for doc_id, c in per_doc.items():
        w_micro = sum(cnt * lr[b] for b, cnt in c.items())
        scored.append(
            (doc_id, meta[doc_id][0], meta[doc_id][1], sum(c.values()), w_micro)
        )
    scored.sort(key=lambda t: (-t[4], t[0]))
    return scored[:topk]


def test_dsir_weights_match_pure_python_lm(spark):
    """The DSIR query's entire numeric chain — md5 bucketing, add-1
    smoothed LMs, micro-unit log-ratios, integer doc weights, the top-k
    order — re-derived independently in pure Python and compared
    EXACTLY (everything lives on the integer micro-grid)."""
    from mapreduceindex_demo_spark.plans.curation_ops import (
        _DSIR_B,
        _DSIR_TOPK,
    )

    src = load_table(spark, PARITY_SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    rows = [(r.doc_id, r.text, r.lang, r.source) for r in src.collect()]
    expect = _py_dsir_expected(rows, _DSIR_B, _DSIR_TOPK)
    got = [
        (r.doc_id, r.source, r.lang, r.n_tokens, r.weight_micro)
        for r in QUERIES["curation_dsir_weights"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expect
    assert got[0][4] > got[-1][4]  # weights genuinely separate
    # the LM is informative in the cross-entropy sense: averaged over
    # the corpus, target-language documents score a higher PER-TOKEN
    # log importance ratio than the rest (Gibbs: E_target[ln(p_t/p_s)]
    # exceeds the raw average; per-doc head membership is NOT asserted —
    # the synthetic vocabulary overlaps heavily across languages, so
    # individual word-salad docs can outrank en docs)
    full = _py_dsir_expected(rows, _DSIR_B, topk=len(rows))
    en = [w / max(n, 1) for _, _, lg, n, w in full if lg == "en"]
    rest = [w / max(n, 1) for _, _, lg, n, w in full if lg != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_gopher_gate_matches_pure_python_rules(spark):
    """Every Gopher rule re-derived per document in pure Python
    (integer cross-multiplications, identical to the plan) and rolled
    up per source — pins the rule semantics, not just the totals."""
    import re as _re
    from collections import Counter, defaultdict

    from mapreduceindex_demo_spark.plans.curation_ops import (
        _GOPHER_ALPHA_DEN,
        _GOPHER_ALPHA_NUM,
        _GOPHER_DUP3_DEN,
        _GOPHER_DUP3_NUM,
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_WORDS,
        _GOPHER_STOPWORDS,
        _GOPHER_TOP2_DEN,
        _GOPHER_TOP2_NUM,
        _GOPHER_WL_HI,
        _GOPHER_WL_LO,
    )

    src = load_table(spark, PARITY_SF_DIR, "documents").select(
        "source", "text"
    )
    agg: dict[str, Counter] = defaultdict(Counter)
    for r in src.collect():
        w = r.text.split(" ")
        n = len(w)
        bg = Counter(zip(w, w[1:]))
        tg = Counter(zip(w, w[1:], w[2:]))
        dupi = sum(c for c in tg.values() if c > 1)
        toti = sum(tg.values())
        ok = {
            "nwords": _GOPHER_MIN_WORDS <= n <= _GOPHER_MAX_WORDS,
            "wordlen": (
                _GOPHER_WL_LO * n
                <= len(r.text) - n + 1
                <= _GOPHER_WL_HI * n
            ),
            "stop": len(set(w) & set(_GOPHER_STOPWORDS)) >= 1,
            "alpha": (
                sum(1 for t in w if _re.search("[a-zA-Z]", t))
                * _GOPHER_ALPHA_DEN
                >= _GOPHER_ALPHA_NUM * n
            ),
            "top2gram": (
                (max(bg.values()) if bg else 0) * 2 * _GOPHER_TOP2_DEN
                <= _GOPHER_TOP2_NUM * n
            ),
            "dup3gram": (
                dupi * _GOPHER_DUP3_DEN
                <= _GOPHER_DUP3_NUM * (toti if toti else 1)
            ),
        }
        a = agg[r.source]
        a["docs"] += 1
        a["kept"] += int(all(ok.values()))
        for k, v in ok.items():
            a[f"fail_{k}"] += int(not v)
    got = {
        r.source: r.asDict()
        for r in QUERIES["text_gopher_gate"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert set(got) == set(agg)
    for s, a in agg.items():
        g = got[s]
        for k in (
            "docs", "kept", "fail_nwords", "fail_wordlen", "fail_stop",
            "fail_alpha", "fail_top2gram", "fail_dup3gram",
        ):
            assert g[k] == a[k], (s, k, g[k], a[k])
    # both branches of the corpus-exercised rules are real
    assert sum(a["fail_nwords"] for a in agg.values()) > 0
    assert sum(a["fail_stop"] for a in agg.values()) > 0
    assert sum(a["fail_top2gram"] for a in agg.values()) > 0
    assert sum(a["kept"] for a in agg.values()) > 0


def test_gopher_gate_plan_is_scan_local(spark):
    """The load-bearing scale property of the r13 respelling: the
    repetition statistics are run-length folds over per-row sorted gram
    arrays, so the executed plan holds ONE parquet scan, NO join, and
    no exchange keyed on doc_id — only the O(|sources|) rollup and the
    output sort may shuffle."""
    df = QUERIES["text_gopher_gate"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    import re

    for m in re.finditer(r"Exchange (\w+partitioning)\(([^)]*)\)", plan):
        assert "doc_id" not in m.group(2), plan


def test_dsir_plan_shape_one_scan_bounded_broadcast(spark):
    """DSIR's scale contract: ONE parquet scan (the (doc,bucket) count
    table feeds the LMs AND the scoring join from its persist), exactly
    one BroadcastHashJoin whose build side is the <=4096-row log-ratio
    table, no SortMergeJoin, and no docs-sized build anywhere (source/
    lang ride the groupBy instead of a final rejoin)."""
    df = QUERIES["curation_dsir_weights"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ccnet_buckets_match_pure_python_lm(spark):
    """The CCNet bucketing chain — per-lang add-0.5 bigram LMs,
    micro-unit per-vocab-entry nlp, integer doc scores, exact integer
    count-percentile boundaries, value-threshold bucket assignment, the
    rollup — re-derived in pure Python and compared exactly."""
    import math
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    def _round_int(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    src = load_table(spark, PARITY_SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    rows = [(r.doc_id, r.text, r.lang) for r in src.collect()]
    c2: dict[str, Counter] = defaultdict(Counter)
    vocab: dict[str, set] = defaultdict(set)
    per_doc: dict[int, tuple] = {}
    for doc_id, text, lang in rows:
        w = text.split(" ")
        vocab[lang].update(w)
        grams = Counter(zip(w, w[1:]))
        per_doc[doc_id] = (lang, grams)
        c2[lang].update(grams)
    ch: dict[str, Counter] = {
        lang: Counter() for lang in c2
    }
    for lang, cc in c2.items():
        for (h, _), n in cc.items():
            ch[lang][h] += n
    lp: dict[str, dict] = defaultdict(dict)
    for lang, cc in c2.items():
        vsz = len(vocab[lang])
        for g, n in cc.items():
            lp[lang][g] = _round_int(
                -math.log((n + 0.5) / (ch[lang][g[0]] + 0.5 * vsz)) * 1e6
            )
    scored: dict[str, list] = defaultdict(list)
    for doc_id, (lang, grams) in per_doc.items():
        nb = sum(grams.values())
        if nb == 0:
            continue
        tot = sum(n * lp[lang][g] for g, n in grams.items())
        avg = _round_int(tot / nb)
        scored[lang].append((doc_id, nb, avg))
    expect: dict[tuple, list] = defaultdict(list)
    for lang, docs in scored.items():
        vals = sorted(a for _, _, a in docs)
        n = len(vals)
        cum: Counter = Counter()
        q1 = q2 = None
        seen = 0
        for v in sorted(set(vals)):
            seen += vals.count(v)
            if q1 is None and seen * 3 >= n:
                q1 = v
            if q2 is None and seen * 3 >= 2 * n:
                q2 = v
        for doc_id, nb, a in docs:
            b = "head" if a <= q1 else ("middle" if a <= q2 else "tail")
            expect[(lang, b)].append((nb, a))
    want = {
        k: (
            len(v),
            sum(nb for nb, _ in v),
            engine_round(sum(a for _, a in v) / len(v) / 1e6, 6),
        )
        for k, v in expect.items()
    }
    got = {
        (r.lang, r.bucket): (r.n_docs, r.n_bigrams, r.mean_nlp)
        for r in QUERIES["text_ccnet_ppl_buckets"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert got == want
    # every language splits into three real buckets and head is the
    # most fluent (lowest mean nlp) per language
    langs = {k[0] for k in got}
    for lg in langs:
        assert {b for (l2, b) in got if l2 == lg} == {"head", "middle", "tail"}
        assert got[(lg, "head")][2] < got[(lg, "tail")][2]


def test_ccnet_plan_no_doc_sort_and_broadcast_bounds(spark):
    """The CCNet query's 100 TB claims, pinned like its siblings: the
    only Window nodes run over the (lang, distinct-score) FREQUENCY
    table (their child aggregates on avg_micro — never a window over
    doc-level rows), the bounds/LM joins stay broadcast (no
    SortMergeJoin anywhere), and exactly one parquet scan feeds it all
    via the persisted gram-count table."""
    df = QUERIES["text_ccnet_ppl_buckets"].fn(spark, PARITY_SF_DIR)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    final = full.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "SortMergeJoin" not in full, full
    # every window partitions by lang and orders by the score column of
    # the frequency aggregate — no doc_id anywhere in a window spec
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", full)
    assert specs, full
    for spec in specs:
        assert "doc_id" not in spec, spec
        assert spec.startswith("lang"), spec


def test_gopher_runlength_fold_fuzz(spark):
    """Seeded fuzz of the production run-length fold
    (gopher_repetition_exprs) over inputs the corpus never produces —
    empty docs, single tokens, tiny vocabularies forcing heavy gram
    ties, all-identical tokens, empty-string tokens from double spaces —
    compared exactly against a Counter-based Python mirror."""
    import random
    from collections import Counter

    from mapreduceindex_demo_spark.plans.curation_ops import (
        gopher_repetition_exprs,
    )

    rng = random.Random(1309)
    vocab = ["a", "bb", "ccc", "x", ""]
    docs = []
    for i in range(300):
        n = rng.choice([0, 1, 2, 3, rng.randint(4, 30)])
        docs.append((i, [rng.choice(vocab) for _ in range(n)]))
    # degenerate extremes
    docs.append((300, ["z"] * 25))
    docs.append((301, ["p", "q"] * 12))
    sdf = spark.createDataFrame(
        [(i, w) for i, w in docs], "doc_id LONG, w ARRAY<STRING>"
    )
    mc, dupi = gopher_repetition_exprs()
    got = {
        r.doc_id: (r.mc, r.dupi)
        for r in sdf.select(
            "doc_id", mc.alias("mc"), dupi.alias("dupi")
        ).collect()
    }
    for i, w in docs:
        bg = Counter(zip(w, w[1:]))
        tg = Counter(zip(w, w[1:], w[2:]))
        want_mc = max(bg.values()) if bg else 0
        want_dupi = sum(c for c in tg.values() if c > 1)
        assert got[i] == (want_mc, want_dupi), (i, w, got[i])


def test_fasttext_gate_matches_pure_python_model(spark):
    """The full classifier chain — unigram+bigram features, md5 bucket
    hashing, the frozen domain-separated weight derivation, integer doc
    logits, the sum-sign keep rule, the per-source rollup — re-derived
    in pure Python over the same parquet and compared exactly."""
    import hashlib
    from collections import defaultdict

    from mapreduceindex_demo_spark.plans.curation_ops import _FT_B, _FT_WSPAN

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def weight(f: str) -> int:
        b = h32(f) % _FT_B
        return h32(f"ftw:{b}") % _FT_WSPAN - _FT_WSPAN // 2

    docs = load_table(spark, PARITY_SF_DIR, "documents").select(
        "source", "text"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, keep, logit, feats
    for r in docs:
        ws = r.text.split(" ")
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        lm = sum(weight(f) for f in feats)
        a = agg[r.source]
        a[0] += 1
        a[1] += 1 if lm >= 0 else 0
        a[2] += lm
        a[3] += len(feats)
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    # abtt_g6, not Python round(): the engines round the shortest-decimal
    # repr HALF_UP, so a keep ratio landing on a 6-dp half would diverge
    # from round()'s half-to-even (r13 ADVICE item).
    expected = {
        s: (v[0], v[1], abtt_g6(v[1] / v[0]), v[2], v[3])
        for s, v in agg.items()
    }
    got = {
        r.source: (r.n_docs, r.n_keep, r.keep_rate, r.logit_sum_micro, r.n_feats)
        for r in QUERIES["curation_fasttext_gate"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert got == expected
    # both decision branches live on this corpus
    assert any(v[1] < v[0] for v in got.values())
    assert any(v[1] > 0 for v in got.values())


def test_fasttext_gate_plan_is_codegen_scoring(spark):
    """Classifier INFERENCE's scale contract: one parquet scan, zero
    joins (weights are derived in-expression, not joined), the weight
    chain inside whole-stage codegen (never an interpreted lambda — the
    measured 1.5x at ~sf1, BASELINE.md r13b), and every exchange fed by
    a partial aggregate, so the doc hop carries |docs| rows and the
    rollup |sources| rows — never the feature stream."""
    df = QUERIES["curation_fasttext_gate"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    # the md5->bucket->weight chain sits in a codegen'd project/aggregate,
    # not inside a higher-order lambdafunction
    assert "lambdafunction(md5" not in plan.replace(" ", ""), plan
    # the doc hop and the rollup both partial-aggregate map-side, and the
    # only exchanges are those two plus the output sort's range partition
    assert "partial_sum" in plan, plan
    assert plan.count("Exchange") <= 3, plan


def test_dsir_sample_is_gumbel_top_k_of_the_weights(spark):
    """The Gumbel-top-k draw re-derived in pure Python on top of the
    weights the ranking query serves under the same shared kernel: key =
    logweight - ln(-ln(u)) with u from the domain-separated doc-id hash;
    and the draw must genuinely differ from the plain weight top-k (the
    noise does its sampling job) while still being weight-biased."""
    import hashlib
    import math

    from mapreduceindex_demo_spark.plans.curation_ops import (
        _DSIR_SAMPLE_K,
        _dsir_weight_frame,
    )

    w = {
        r.doc_id: (r.source, r.n_tokens, r.weight_micro)
        for r in _dsir_weight_frame(spark, PARITY_SF_DIR).collect()
    }

    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    def key(doc_id, wm):
        h = int(hashlib.md5(f"dsg:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        # abtt_g6 mirrors the engines' HALF_UP-on-repr rounding; Python
        # round() (half-to-even) can flip a key on a 6-dp half and even
        # reorder the top-k cutoff (r13 ADVICE item).
        return abtt_g6(wm / 1000000.0 - math.log(-math.log(u)))

    scored = sorted(
        ((key(d, v[2]), d) for d, v in w.items()), key=lambda t: (-t[0], t[1])
    )[:_DSIR_SAMPLE_K]
    expected = [
        (d, w[d][0], w[d][1], w[d][2], k) for k, d in scored
    ]
    got = [
        (r.doc_id, r.source, r.n_tokens, r.weight_micro, r.gumbel_key)
        for r in QUERIES["curation_dsir_sample"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert got == expected
    # the noise genuinely samples: the draw is not the plain weight top-k
    plain = {
        d
        for d, _ in sorted(
            w.items(), key=lambda kv: (-kv[1][2], kv[0])
        )[:_DSIR_SAMPLE_K]
    }
    drawn = {d for d, *_ in got}
    assert drawn != plain
    # ... but remains weight-biased: the drawn set's mean weight sits
    # above the corpus mean
    mean_all = sum(v[2] for v in w.values()) / len(w)
    mean_drawn = sum(w[d][2] for d in drawn) / len(drawn)
    assert mean_drawn > mean_all


def test_fasttext_gate_learned_weight_table_swaps_in(spark):
    """The gate docstring's 'a learned model swaps in' claim, exercised
    (r13 verdict item 7): train a small integer perceptron in pure Python
    over the SAME hashed feature buckets (labels: lang == 'en'), hand the
    learned <= _FT_B-row weight table to fasttext_gate_with_weights as
    literal rows, and check the Spark gate's per-source report against
    the pure-Python model scored with the same weights. Also pins the
    promised plan delta: exactly one build-side (broadcast) join appears,
    and nothing else changes shape."""
    import hashlib
    from collections import defaultdict

    from mapreduceindex_demo_spark.plans.curation_ops import (
        _FT_B,
        fasttext_gate_with_weights,
    )

    def bucket(f: str) -> int:
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % _FT_B

    docs = load_table(spark, PARITY_SF_DIR, "documents").select(
        "doc_id", "source", "lang", "text"
    ).collect()
    feats_by_doc = []
    for r in sorted(docs, key=lambda r: r.doc_id):
        ws = r.text.split(" ")
        bs = [bucket(f) for f in ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]]
        feats_by_doc.append((r.source, 1 if r.lang == "en" else -1, bs))

    # a deterministic integer perceptron: 2 epochs in doc_id order
    w = defaultdict(int)
    for _ in range(2):
        for _, y, bs in feats_by_doc:
            if (1 if sum(w[b] for b in bs) >= 0 else -1) != y:
                for b in bs:
                    w[b] += y
    learned = {b: v for b, v in w.items() if v != 0}
    assert 0 < len(learned) <= _FT_B

    # pure-Python scoring under the learned table
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, _, bs in feats_by_doc:
        lm = sum(learned.get(b, 0) for b in bs)
        a = agg[src]
        a[0] += 1
        a[1] += 1 if lm >= 0 else 0
        a[2] += lm
        a[3] += len(bs)
    from mapreduceindex_demo_spark.plans.vector_ops import abtt_g6

    expected = {
        s: (v[0], v[1], abtt_g6(v[1] / v[0]), v[2], v[3])
        for s, v in agg.items()
    }

    weights = spark.createDataFrame(
        sorted(learned.items()), "bucket long, w long"
    )
    df = fasttext_gate_with_weights(spark, PARITY_SF_DIR, weights)
    got = {
        r.source: (r.n_docs, r.n_keep, r.keep_rate, r.logit_sum_micro, r.n_feats)
        for r in df.collect()
    }
    assert got == expected
    # the learned gate genuinely discriminates (both branches alive)
    assert any(v[1] < v[0] for v in got.values())
    assert any(v[1] > 0 for v in got.values())

    # plan delta vs the frozen-formula query: ONE planner-chosen
    # broadcast build of the bounded weight table, still one parquet
    # scan, exchanges still carry |docs| / |sources| rows
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_sum" in plan, plan
