"""COVERAGE.md is the judge-facing inventory map — every [q:name] tag in it
must name a REAL registered query, and every registered query must be
claimed somewhere in COVERAGE.md. Prevents doc drift as the suite grows."""

from __future__ import annotations

import re
from pathlib import Path

from mapreduceindex_demo_spark.plans import QUERIES

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_every_coverage_tag_is_a_registered_query():
    tags = set(re.findall(r"\[q:([a-z0-9_]+)\]", COVERAGE.read_text()))
    unknown = sorted(tags - set(QUERIES))
    assert not unknown, f"COVERAGE.md references unregistered queries: {unknown}"


def test_every_query_is_claimed_in_coverage():
    tags = set(re.findall(r"\[q:([a-z0-9_]+)\]", COVERAGE.read_text()))
    unclaimed = sorted(set(QUERIES) - tags)
    assert not unclaimed, f"queries not claimed in COVERAGE.md: {unclaimed}"


def test_driver_window_covers_every_operator_family():
    """The correctness driver checks only the FIRST 50 registered queries
    (r1 finding). Assert the curated window holds: every operator family
    has at least one representative inside it."""
    from mapreduceindex_demo_spark.plans import PRIORITY_50

    names = list(QUERIES)
    assert names[:50] == PRIORITY_50
    window = set(PRIORITY_50)

    families = {
        "mapindex": {n for n in QUERIES if n.startswith("mapindex_")},
        "streaming_window": {"streaming_tumbling_counts", "streaming_session_windows"},
        "streaming_join": {"streaming_interval_join"},
        "streaming_sink": {"streaming_index_maintenance"},
        "stateful": {"stateful_running_counters"},
        "sql_surface": {"sql_grouping_sets"},
        "text": {n for n in QUERIES if n.startswith("text_")},
        "dedup": {n for n in QUERIES if n.startswith("dedup_")},
        "similarity": {n for n in QUERIES if n.startswith("similarity_")},
        "multimodal": {n for n in QUERIES if n.startswith("multimodal_")},
        "embedding": {"embedding_int8_quantization"},
        "curation": {"curated_training_set", "balanced_source_sample"},
        "wordcount": {"mapreduce_wordcount"},
        "events_relational": {n for n in QUERIES if n.startswith("events_")},
        "window_fns": {"user_sessionization", "customer_running_spend"},
        "asof_join": {"purchase_last_click_asof"},
        "udaf": {"udaf_weighted_avg_pandas"},
        "subqueries": {"skew_salted_join_volume", "suppliers_above_nation_avg"},
        "tpch_join_shapes": {"nation_market_share_yearly", "blocking_suppliers"},
    }
    uncovered = {fam for fam, members in families.items() if not members & window}
    assert not uncovered, f"operator families with no query in driver window: {uncovered}"

    # the mapindex subsystem keeps a broad delegation inside the window:
    # build, scan, and incremental-maintenance paths all represented
    assert len(families["mapindex"] & window) >= 5


def _ever_green() -> set[str]:
    """Names green in at least one committed CORRECTNESS_r*.json: rows_match
    + schema_match + no error, and hash_match not explicitly false (rows-only
    checks report hash_match=None)."""
    import json

    green: set[str] = set()
    root = Path(__file__).resolve().parent.parent
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                green.add(name)
    return green


def test_rotated_out_queries_have_a_committed_green_row():
    """THE rotation invariant (r4 verdict item 3): a query may only leave
    the driver's 50-query window if some committed CORRECTNESS_r*.json
    already proves it green externally. This is the machine check that
    would have caught the three r1-red relational queries silently
    rotating out in r2-r4."""
    from mapreduceindex_demo_spark.plans import PRIORITY_50

    outside = set(QUERIES) - set(PRIORITY_50)
    never_verified = sorted(outside - _ever_green())
    assert not never_verified, (
        "queries rotated out of the driver window without any committed "
        f"external green row: {never_verified} — put them back in "
        "PRIORITY_50 until a CORRECTNESS_r*.json proves them"
    )


def test_baseline_newest_pair_paragraph_quotes_live_flag_count():
    """r15 verdict #3: BASELINE.md's newest same-session pair paragraph
    said "28 current flags" while the registry carries 26. The NEWEST
    "grand over the N current flags" figure is judge-facing arithmetic —
    pin it to the live registry count (older rounds' paragraphs quote
    their own era's count and are historical record, so only the last
    occurrence is checked)."""
    baseline = Path(__file__).resolve().parent.parent / "BASELINE.md"
    counts = re.findall(
        r"grand over the (\d+) current flags", baseline.read_text()
    )
    assert counts, "BASELINE.md lost its same-session pair paragraph"
    live = sum(1 for q in QUERIES.values() if q.bench)
    assert int(counts[-1]) == live, (
        f"BASELINE.md's newest pair paragraph says {counts[-1]} flags; "
        f"the registry has {live}"
    )
