"""Pin the synthetic-SNM-corpus generator's BASE constant to the real
sf0.1 customer parquet (r10 review lesson / r10 verdict item 6: the
constant was once written from memory at 10x the true row count, which
would have silently overlapped replica key ranges and changed match
density). The generator itself refuses to run on drift
(scripts/synth_snm_corpus.py::_assert_base_matches_footer); this test
fails the suite on the same drift without needing a Spark session."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from scripts.synth_snm_corpus import BASE, SRC


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SRC, "customer.parquet")),
    reason="sf0.1 testdata not present",
)
def test_base_matches_sf01_customer_footer():
    src = os.path.join(SRC, "customer.parquet")
    meta = pq.ParquetFile(src).metadata
    assert meta.num_rows == BASE, (
        f"BASE={BASE} but {src} has {meta.num_rows} rows — testdata "
        "regenerated; update scripts/synth_snm_corpus.py::BASE"
    )
    # key disjointness needs every key in [0, BASE): replica r shifts
    # keys by r*BASE, so a key outside that range would collide with a
    # neighboring replica's range (keys are 0-based in this testdata:
    # 0..BASE-1)
    keys = pq.read_table(src, columns=["c_custkey"])["c_custkey"]
    assert pc.min(keys).as_py() >= 0
    assert pc.max(keys).as_py() < BASE
