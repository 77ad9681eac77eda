"""Brute-force recomputation of the Pareto frontier (skyline) — the O(n²)
dominance check the two-window plan replaces — plus plan-shape pins."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _points():
    t = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "n_chars"],
    ).to_pylist()
    pts = {}
    for r in t:
        tk = r["text"].split(" ")
        q = engine_round(min(len(tk) / 100.0, 1.0) * (len(set(tk)) / len(tk)), 6)
        pts[r["doc_id"]] = (int(round(q * 1_000_000)), int(r["n_chars"]))
    return pts


def _brute_skyline(pts):
    out = set()
    for d, (q, l) in pts.items():
        dominated = any(
            oq >= q and ol >= l and (oq > q or ol > l)
            for od, (oq, ol) in pts.items()
            if od != d
        )
        if not dominated:
            out.add(d)
    return out


def test_pareto_matches_brute_force(spark):
    pts = _points()
    expect = _brute_skyline(pts)
    rows = QUERIES["curation_pareto_frontier"].fn(spark, PARITY_SF_DIR).collect()
    assert {r.doc_id for r in rows} == expect
    for r in rows:
        qm, nc = pts[r.doc_id]
        assert r.n_chars == nc
        assert abs(r.quality - qm / 1_000_000.0) < 1e-9
    # the frontier is a real curve, not a degenerate single point or
    # the whole corpus
    assert 1 < len(expect) < len(pts)


def test_pareto_global_window_sees_only_local_survivors(spark):
    """The distributive two-phase shape: the bucketed local pass is the
    only operator that touches corpus-sized data; the single-partition
    global window runs over the local skylines (frontier-sized). Pinned
    as: exactly one corpus-wide hash exchange (the 32-bucket local pass)
    and exactly one SinglePartition exchange fed by the filtered local
    output, never by a scan."""
    df = QUERIES["curation_pareto_frontier"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1, plan
    # both skyline passes are window operators: two Window nodes, no Join
    assert len(re.findall(r"\bWindow\b", plan)) >= 2, plan
    assert len(re.findall(r"Join", plan)) == 0, plan
