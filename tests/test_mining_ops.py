"""Independent recomputations for the round-8 fourth-session operators:
a-priori frequent pairs (pure-Python counting), the change-point scan
(pandas rolling sums), chi-squared feature selection (pure-Python
contingency), and the Benford audit (pure-Python digit histogram) — third
implementations beside the Spark plans and the DuckDB oracles."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.plans.mining_ops import (
    _BENFORD,
    _CHI_MIN_DF,
    _CP_W,
    _ITEM_MIN_COUNT,
    _PAIR_MIN_COUNT,
)
from tests.conftest import PARITY_SF_DIR


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# --------------------------------------------------------------------------
# basket_frequent_pairs
# --------------------------------------------------------------------------


def _py_frequent_pairs():
    li = pq.read_table(
        f"{PARITY_SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    baskets: dict[int, set[int]] = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n = len(baskets)
    item_cnt: Counter = Counter()
    for items in baskets.values():
        item_cnt.update(items)
    freq = {pk for pk, c in item_cnt.items() if c >= _ITEM_MIN_COUNT}
    pair_cnt: Counter = Counter()
    for items in baskets.values():
        fi = sorted(i for i in items if i in freq)
        for i, p1 in enumerate(fi):
            for p2 in fi[i + 1 :]:
                pair_cnt[(p1, p2)] += 1
    rows = []
    for (p1, p2), pc in pair_cnt.items():
        if pc >= _PAIR_MIN_COUNT:
            rows.append(
                (
                    p1,
                    p2,
                    pc,
                    engine_round(pc / n, 6),
                    engine_round((pc * n) / (item_cnt[p1] * item_cnt[p2]), 6),
                )
            )
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:20], n, freq


def test_frequent_pairs_match_python_apriori(spark):
    expect, _, freq = _py_frequent_pairs()
    got = QUERIES["basket_frequent_pairs"].fn(spark, PARITY_SF_DIR).collect()
    assert len(got) == len(expect) > 0
    for g, e in zip(got, expect):
        assert (g.p1, g.p2, g.pair_count) == e[:3], (g, e)
        assert abs(g.support - e[3]) < 1e-9
        assert abs(g.lift - e[4]) < 1e-9
    # the a-priori prune must actually prune at test scale — otherwise the
    # scale claim (bounded pair fan-out) is untested
    item_universe = pq.read_table(
        f"{PARITY_SF_DIR}/lineitem.parquet", columns=["l_partkey"]
    )["l_partkey"].to_pylist()
    assert len(freq) < len(set(item_universe))


def test_frequent_pairs_plan_is_equi_join(spark):
    """Pair generation is an equi-join on the basket key — never a
    cartesian/nested-loop pairing (the 1-row basket-count sides are the
    only broadcast-nested-loop crossings)."""
    df = QUERIES["basket_frequent_pairs"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the within-basket self-join must key on the basket id
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_frequent_pairs_single_corpus_exchange(spark):
    """The r10 respelling's contract: exactly ONE corpus-sized exchange —
    the basket-key shuffle feeding collect_set, where the (ok, pk) dedup
    now happens. The r9 plan's standalone (ok, pk) DISTINCT exchange (its
    stage-profiled residual vs DuckDB) must not reappear, and the pair
    self-join must ride the cached hash(ok) partitioning instead of
    re-shuffling the corpus."""
    df = QUERIES["basket_frequent_pairs"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    keysets = [
        {c.split("#")[0] for c in m.group(1).split(", ")[:-1]}
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]+)\)", plan)
    ]
    # the old distinct exchanged on BOTH basket and item keys — banned
    assert {"ok", "pk"} not in keysets, keysets
    # exactly one exchange keyed on the basket key alone (the collect_set)
    assert keysets.count({"ok"}) == 1, keysets


# --------------------------------------------------------------------------
# basket_frequent_triples — a-priori round 2
# --------------------------------------------------------------------------


def test_frequent_triples_match_python_levelwise(spark):
    """Pure-Python level-wise a-priori (items -> pairs -> candidate
    triples -> counts), the third implementation beside plan and oracle.
    Also asserts the level-2 prune is structurally exercised: every
    reported triple's three sub-pairs are frequent."""
    from itertools import combinations

    from mapreduceindex_demo_spark.plans.mining_ops import (
        _TRI_DEN,
        _TRI_ITEM_DEN,
        _TRI_PAIR_DEN,
    )

    ev = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet", columns=["ts", "user_id", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.floor("D")
    baskets: dict[tuple, set] = defaultdict(set)
    for u, d, et in zip(ev["user_id"], ev["d"], ev["event_type"]):
        baskets[(u, d)].add(et)
    n = len(baskets)
    item_cnt: Counter = Counter()
    for its in baskets.values():
        item_cnt.update(its)
    fitems = {it for it, c in item_cnt.items() if c * _TRI_ITEM_DEN >= n}
    pair_cnt: Counter = Counter()
    tri_cnt: Counter = Counter()
    for its in baskets.values():
        fs = sorted(i for i in its if i in fitems)
        for p in combinations(fs, 2):
            pair_cnt[p] += 1
    fpairs = {p for p, c in pair_cnt.items() if c * _TRI_PAIR_DEN >= n}
    for its in baskets.values():
        fs = sorted(i for i in its if i in fitems)
        for t in combinations(fs, 3):
            if all(sp in fpairs for sp in combinations(t, 2)):
                tri_cnt[t] += 1
    expect = sorted(
        (
            (t[0], t[1], t[2], c, engine_round(c / n, 6))
            for t, c in tri_cnt.items()
            if c * _TRI_DEN >= n
        ),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )
    got = QUERIES["basket_frequent_triples"].fn(spark, PARITY_SF_DIR).collect()
    assert len(got) == len(expect) > 0
    for g, e in zip(got, expect):
        assert (g.e1, g.e2, g.e3, g.triple_count) == e[:4], (g, e)
        assert abs(g.support - e[4]) < 1e-9
    for g in got:
        for sp in combinations((g.e1, g.e2, g.e3), 2):
            assert sp in fpairs


# --------------------------------------------------------------------------
# events_changepoint_scan
# --------------------------------------------------------------------------


def test_changepoint_matches_pandas_rolling(spark):
    e = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    e["d"] = e["ts"].dt.floor("D")
    days = pd.date_range(e["d"].min(), e["d"].max(), freq="D")
    got = {
        r.event_type: r
        for r in QUERIES["events_changepoint_scan"].fn(spark, PARITY_SF_DIR).collect()
    }
    types = sorted(e["event_type"].unique())
    assert set(got) == set(types)
    for et in types:
        cnt = (
            e[e["event_type"] == et].groupby("d").size().reindex(days, fill_value=0)
        )
        best = None  # (abs_shift, day, before, after)
        vals = cnt.to_numpy()
        for i in range(len(days)):
            if i < _CP_W or i + _CP_W > len(days):
                continue
            before = int(vals[i - _CP_W : i].sum())
            after = int(vals[i : i + _CP_W].sum())
            key = (-abs(after - before), days[i])
            if best is None or key < best[0]:
                best = (key, days[i], before, after)
        _, day, before, after = best
        r = got[et]
        assert r.shift_day == day.strftime("%Y-%m-%d"), (et, r, day)
        assert abs(r.before_daily_avg - engine_round(before / _CP_W, 6)) < 1e-9
        assert abs(r.after_daily_avg - engine_round(after / _CP_W, 6)) < 1e-9
        assert abs(r.shift - engine_round((after - before) / _CP_W, 6)) < 1e-9


def test_changepoint_plan_is_windows_over_grid(spark):
    """The fact stream collapses through ONE combiner groupBy to the
    (type, day) grid; the contrast frames and the argmax are windows —
    no self-join of the fact table anywhere."""
    df = QUERIES["events_changepoint_scan"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"Window", plan), plan
    # exchanges: the obs partial-agg, the types distinct, the grid/window
    # partitioning — never one per window frame
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 4, plan


# --------------------------------------------------------------------------
# text_chisq_feature_select
# --------------------------------------------------------------------------


def test_chisq_matches_python_contingency(spark):
    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["text", "lang"]
    ).to_pylist()
    n = len(docs)
    n_en = sum(1 for d in docs if d["lang"] == "en")
    a_cnt: Counter = Counter()
    b_cnt: Counter = Counter()
    for d in docs:
        terms = set(d["text"].split(" "))
        tgt = a_cnt if d["lang"] == "en" else b_cnt
        tgt.update(terms)
    rows = []
    for term in set(a_cnt) | set(b_cnt):
        a, b = a_cnt[term], b_cnt[term]
        if not (_CHI_MIN_DF <= a + b <= n - _CHI_MIN_DF):
            continue
        c, d_ = n_en - a, (n - n_en) - b
        chi2 = engine_round(
            (n * (float(a * d_ - b * c) * float(a * d_ - b * c)))
            / (float(a + b) * float(c + d_) * float(a + c) * float(b + d_)),
            6,
        )
        leans = "en" if a * (n - n_en) > b * n_en else "other"
        rows.append((term, a, b, leans, chi2))
    rows.sort(key=lambda r: (-r[4], r[0]))
    expect = rows[:20]
    got = QUERIES["text_chisq_feature_select"].fn(spark, PARITY_SF_DIR).collect()
    assert len(got) == len(expect) > 0
    for g, e in zip(got, expect):
        assert (g.term, g.df_en, g.df_other, g.leans) == e[:4], (g, e)
        assert abs(g.chi2 - e[4]) < 1e-9, (g, e)


def test_chisq_plan_is_one_vocabulary_groupby(spark):
    """Per-doc distinct terms are scan-local (array_distinct, no distinct
    exchange on exploded rows); the contingency table is one combiner
    groupBy on term; class totals broadcast."""
    df = QUERIES["text_chisq_feature_select"].fn(spark, PARITY_SF_DIR)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan


# --------------------------------------------------------------------------
# quality_benford_audit
# --------------------------------------------------------------------------


def test_benford_matches_python_histogram(spark):
    prices = pq.read_table(
        f"{PARITY_SF_DIR}/orders.parquet", columns=["o_totalprice"]
    )["o_totalprice"].to_pylist()
    digits = [int(str(int(math.floor(p)))[0]) for p in prices if p >= 1]
    n = len(digits)
    cnt = Counter(digits)
    contribs = {}
    for d in range(1, 10):
        e_cnt = n * _BENFORD[d]
        obs = cnt.get(d, 0)
        raw = ((obs - e_cnt) * (obs - e_cnt) / e_cnt) * 1_000_000.0
        contribs[d] = int(math.floor(raw + 0.5) if raw >= 0 else math.ceil(raw - 0.5))
    total = round(sum(contribs.values()) / 1_000_000.0, 6)
    got = QUERIES["quality_benford_audit"].fn(spark, PARITY_SF_DIR).collect()
    assert [r.digit for r in got] == list(range(1, 10))
    for r in got:
        assert r.observed == cnt.get(r.digit, 0)
        assert abs(r.observed_freq - round(r.observed / n, 6)) < 1e-9
        assert r.expected_freq == _BENFORD[r.digit]
        assert abs(r.chi2_contrib - round(contribs[r.digit] / 1e6, 6)) < 1e-9
        assert abs(r.chi2_total - total) < 1e-9
    # bounded synthetic prices genuinely violate Benford — the audit's
    # alarm branch must fire (chi2 far above the 15.5 / 20.1 critical
    # values for 8 degrees of freedom)
    assert total > 100.0


def test_benford_expected_literals_match_the_law():
    assert len(_BENFORD) == 9
    for d, v in _BENFORD.items():
        assert abs(v - math.log10(1 + 1 / d)) < 5e-7
    assert abs(sum(_BENFORD.values()) - 1.0) < 1e-5
