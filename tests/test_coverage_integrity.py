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
