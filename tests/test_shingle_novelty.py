"""Independent (pure-Python) recomputation of the per-source shingle
novelty rate, plus the exchange-reuse plan-shape claim."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _python_novelty():
    t = pq.read_table(
        f"{PARITY_SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    first: dict[str, int] = {}
    per_doc: list[tuple[int, str, set]] = []
    for r in sorted(t, key=lambda r: r["doc_id"]):
        tk = r["text"].split(" ")
        if len(tk) < 3:
            grams = {r["text"]}
        else:
            grams = {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        per_doc.append((r["doc_id"], r["source"], grams))
        for g in grams:
            if g not in first or r["doc_id"] < first[g]:
                first[g] = r["doc_id"]
    out: dict[str, list[int]] = {}
    for doc_id, source, grams in per_doc:
        tot, nov = out.setdefault(source, [0, 0])
        out[source][0] = tot + len(grams)
        out[source][1] = nov + sum(1 for g in grams if first[g] == doc_id)
    return out


def test_novelty_matches_python(spark):
    expect = _python_novelty()
    rows = QUERIES["text_shingle_novelty"].fn(spark, PARITY_SF_DIR).collect()
    assert {r.source for r in rows} == set(expect)
    for r in rows:
        tot, nov = expect[r.source]
        assert (r.n_shingles, r.n_novel) == (tot, nov), r.source
        assert abs(r.novelty_rate - engine_round(nov / tot, 6)) < 1e-12
    # the metric must discriminate: not every source equally novel
    assert len({r.novelty_rate for r in rows}) > 1


def test_novelty_plan_has_one_shingle_exchange(spark):
    """First-occurrence is a window MIN over the shingle partition — the
    exploded rows are exchanged exactly once on sh (plus the |sources|
    rollup exchange), there is no self-join, and the explode subtree
    appears once (measured 2.2× faster than the groupBy+join spelling)."""
    df = QUERIES["text_shingle_novelty"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
    assert len(re.findall(r"Join", plan)) == 0, plan
    assert len(re.findall(r"Generate explode", plan)) == 1, plan
