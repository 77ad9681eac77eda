"""Invariants of the nearest-neighbor 2x downsample (oracle parity is the
driver's job; these pin the resample semantics independently)."""

from __future__ import annotations

import numpy as np

from mapreduceindex_demo_spark.functions.multimodal import _CHECKSUM_MOD
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import PARITY_SF_DIR


def test_resize_matches_reference_resample(spark):
    rows = {
        r.doc_id: r
        for r in QUERIES["multimodal_resize_downsample"].fn(spark, PARITY_SF_DIR).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, PARITY_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert set(rows) == set(docs)
    for did, text in list(docs.items())[:50]:
        arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        n = arr.size
        # reference resample: reshape-with-pad then [::2, ::2]
        h = -(-n // 16)
        padded = np.full(h * 16, -1, dtype=np.int64)
        padded[:n] = arr
        grid = padded.reshape(h, 16)[::2, ::2].ravel()
        out = grid[grid >= 0]
        r = rows[did]
        assert r.out_width == 8
        assert r.out_height == (h + 1) // 2
        assert r.n_out_pixels == out.size
        assert r.out_byte_sum == int(out.sum())
        chk = int((out * (np.arange(out.size) + 1)).sum() % _CHECKSUM_MOD)
        assert r.out_pos_checksum == chk
        m = out.size
        micro = (2 * int(out.sum()) * 1_000_000 + m) // (2 * m)
        assert abs(r.out_mean_byte - micro / 1_000_000.0) < 1e-12
