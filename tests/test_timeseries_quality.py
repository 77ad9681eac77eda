"""Independent recomputations for the round-8b operators: calendar-spine
gap fill (pandas resample/ffill), the constraint audit (pandas counts), and
PMI collocations (pure-Python counts) — third implementations beside the
Spark plans and the DuckDB oracles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _micro_half_away(v: np.ndarray) -> np.ndarray:
    """round(x * 1e6) with ties away from zero — the Spark/DuckDB round()
    semantics (numpy/python round() is banker's and would diverge)."""
    s = v * 1_000_000.0
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(
        np.int64
    )


def test_gap_fill_matches_pandas_resample_ffill(spark):
    e = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    e["h"] = e["ts"].dt.floor("h")
    e["micro"] = _micro_half_away(e["value"].to_numpy())
    obs = e.groupby(["event_type", "h"])["micro"].max()
    hours = pd.date_range(e["h"].min(), e["h"].max(), freq="h")
    got = {
        (r.event_type, r.hour): r
        for r in QUERIES["events_gap_fill_hourly"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert len(got) == len(hours) * e["event_type"].nunique()
    n_gaps = 0
    for et in sorted(e["event_type"].unique()):
        series = obs.loc[et].reindex(hours)
        filled = series.ffill()
        for h in hours:
            r = got[(et, h.strftime("%Y-%m-%d %H:00"))]
            is_gap = bool(pd.isna(series.loc[h]))
            n_gaps += is_gap
            assert r.is_gap == is_gap, (et, h)
            if pd.isna(filled.loc[h]):
                assert r.value_ffill is None, (et, h, r)
            else:
                expect = round(float(filled.loc[h]) / 1_000_000.0, 6)
                assert abs(r.value_ffill - expect) < 1e-9, (et, h, r)
    # the operator must actually have something to fill at test scale
    assert n_gaps > 0


def test_constraint_audit_matches_pandas_counts(spark):
    li = pq.read_table(f"{PARITY_SF_DIR}/lineitem.parquet").to_pandas()
    orders = pq.read_table(
        f"{PARITY_SF_DIR}/orders.parquet", columns=["o_orderkey"]
    ).to_pandas()
    n = len(li)
    expect = {
        "completeness_l_returnflag": int(li["l_returnflag"].notna().sum()),
        "uniqueness_orderkey_linenumber": int(
            li.dropna(subset=["l_orderkey", "l_linenumber"])
            .drop_duplicates(["l_orderkey", "l_linenumber"])
            .shape[0]
        ),
        "range_l_discount_0_to_0.1": int(
            ((li["l_discount"] >= 0) & (li["l_discount"] <= 0.1)).sum()
        ),
        "min_l_quantity_positive": int((li["l_quantity"] > 0).sum()),
        "accepted_values_l_returnflag": int(
            li["l_returnflag"].isin(["A", "N", "R"]).sum()
        ),
        "refint_orderkey_in_orders": int(
            li["l_orderkey"].isin(orders["o_orderkey"]).sum()
        ),
    }
    rows = {
        r.check_name: r
        for r in QUERIES["quality_constraint_audit"].fn(spark, PARITY_SF_DIR).collect()
    }
    assert set(rows) == set(expect)
    for name, cnt in expect.items():
        r = rows[name]
        assert abs(r.metric - engine_round(cnt / n, 6)) < 1e-9, (name, r)
        if name == "uniqueness_orderkey_linenumber":
            assert r["pass"] == (cnt * 1000 >= n * 999), name
        else:
            assert r["pass"] == (cnt == n), name
    # both verdict branches are exercised on the synthetic data
    verdicts = {r["pass"] for r in rows.values()}
    assert verdicts == {True, False}


def test_pmi_matches_python_counts(spark):
    from mapreduceindex_demo_spark.plans.corpus_ops import (
        _PMI_MIN_CNT,
        _PMI_TOPK,
    )

    docs = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["text"]
    ).to_pylist()
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    n1 = n2 = 0
    for d in docs:
        toks = d["text"].split(" ")  # NOT .split(): empty tokens preserved
        for t in toks:
            c1[t] = c1.get(t, 0) + 1
            n1 += 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            n2 += 1
    scored = [
        (
            engine_round(
                math.log((cnt * float(n1) * float(n1)) / (float(n2) * c1[a] * c1[b])),
                6,
            ),
            a,
            b,
            cnt,
        )
        for (a, b), cnt in c2.items()
        if cnt >= _PMI_MIN_CNT
    ]
    expect = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:_PMI_TOPK]
    got = QUERIES["text_pmi_collocations"].fn(spark, PARITY_SF_DIR).collect()
    assert len(got) == min(_PMI_TOPK, len(scored))
    assert len(got) > 0  # min-count threshold leaves real collocations
    for r, (pmi, a, b, cnt) in zip(got, expect):
        assert (r.w1, r.w2, r.pair_cnt) == (a, b, cnt)
        assert abs(r.pmi - pmi) < 2e-6, (r, pmi)


def test_scd2_temporal_join_matches_bisect_python(spark):
    """Third implementation of the SCD2 point-in-time join: per-user
    sorted signup history + bisect per purchase."""
    import bisect

    e = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    ).to_pylist()
    hist: dict[int, list[tuple]] = {}
    for r in e:
        if r["event_type"] == "signup":
            hist.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    for h in hist.values():
        h.sort()
    agg: dict[str, list] = {}
    for r in e:
        if r["event_type"] != "purchase":
            continue
        h = hist.get(r["user_id"], [])
        i = bisect.bisect_right([t for t, _ in h], r["ts"]) - 1
        if i < 0:
            tier = "pre_signup"
        else:
            v = h[i][1]
            tier = "bronze" if v < 100 else ("silver" if v < 300 else "gold")
        micro = int(np.floor(r["value"] * 1_000_000.0 + 0.5))
        a = agg.setdefault(tier, [0, set(), 0])
        a[0] += 1
        a[1].add(r["user_id"])
        a[2] += micro
    rows = (
        QUERIES["events_scd2_temporal_join"].fn(spark, PARITY_SF_DIR).collect()
    )
    assert {r.tier for r in rows} == set(agg)
    # pre-history facts must exist at test scale so the left join's
    # unmatched branch is actually exercised
    assert "pre_signup" in agg
    for r in rows:
        n, users, micro = agg[r.tier]
        assert (r.n_purchases, r.n_users) == (n, len(users)), r.tier
        assert abs(r.revenue - round(micro / 1_000_000.0, 6)) < 1e-9
        assert abs(r.avg_value - engine_round(micro / 1_000_000.0 / n, 6)) < 1e-9


def test_target_encoding_matches_fraction_python(spark):
    from fractions import Fraction

    li = pq.read_table(
        f"{PARITY_SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_returnflag"],
    ).to_pandas()
    pt = pq.read_table(
        f"{PARITY_SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["r"] = (j["l_returnflag"] == "R").astype(int)
    N, R = len(j), int(j["r"].sum())
    rows = QUERIES["feature_target_encoding"].fn(spark, PARITY_SF_DIR).collect()
    by_brand = j.groupby("p_brand")["r"].agg(["count", "sum"])
    assert {r.p_brand for r in rows} == set(by_brand.index)
    m = 50
    for r in rows:
        n, ret = int(by_brand.loc[r.p_brand, "count"]), int(
            by_brand.loc[r.p_brand, "sum"]
        )
        assert (r.n_lines, r.n_returns) == (n, ret), r.p_brand
        assert abs(r.raw_rate - engine_round(ret / n, 6)) < 1e-9
        enc = Fraction(ret * N + m * R, (n + m) * N)
        assert abs(r.enc_rate - engine_round(float(enc), 6)) < 1e-9
        # shrinkage direction: encoded rate sits between raw and prior
        lo, hi = sorted([Fraction(ret, n), Fraction(R, N)])
        assert lo <= enc <= hi, r.p_brand
    # encoding must discriminate between brands at test scale
    assert len({r.enc_rate for r in rows}) > 1


def test_psi_drift_matches_python_counts(spark):
    e = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet", columns=["ts", "value"]
    ).to_pandas()
    us = e["ts"].astype("int64")  # epoch micros
    mid = (int(us.min()) + int(us.max())) // 2
    v = e["value"].to_numpy()
    vmin, vmax = float(v.min()), float(v.max())
    bins = np.minimum(9, np.floor((v - vmin) / (vmax - vmin) * 10.0)).astype(
        int
    )
    exp_mask = (us < mid).to_numpy()
    ce = np.bincount(bins[exp_mask], minlength=10)
    ca = np.bincount(bins[~exp_mask], minlength=10)
    te, ta = int(ce.sum()), int(ca.sum())
    contrib = []
    for i in range(10):
        p = (int(ce[i]) + 1) / (te + 10)
        q = (int(ca[i]) + 1) / (ta + 10)
        contrib.append(engine_round((p - q) * math.log(p / q), 6))
    tot = round(sum(int(round(c * 1_000_000.0)) for c in contrib) / 1e6, 6)
    rows = QUERIES["quality_psi_drift"].fn(spark, PARITY_SF_DIR).collect()
    assert [r.bin for r in rows] == list(range(10))
    for r in rows:
        assert (r.expected_cnt, r.actual_cnt) == (int(ce[r.bin]), int(ca[r.bin]))
        assert abs(r.psi_contrib - contrib[r.bin]) < 1e-9, r.bin
        assert abs(r.psi_total - tot) < 1e-9
    # both periods must be populated for the monitor to mean anything
    assert te > 0 and ta > 0
