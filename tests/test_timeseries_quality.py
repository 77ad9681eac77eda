"""Independent recomputations for the round-8b operators: calendar-spine
gap fill (pandas resample/ffill), the constraint audit (pandas counts), and
PMI collocations (pure-Python counts) — third implementations beside the
Spark plans and the DuckDB oracles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

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
        assert abs(r.metric - round(cnt / n, 6)) < 1e-9, (name, r)
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
            round(
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
