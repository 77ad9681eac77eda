"""Z-order layout (sources/zorder.py): multi-dimensional clustering must
make footer-stats pruning effective on BOTH clustered columns, where a
single-column sort order helps only its own column."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.session import load_table
from mapreduceindex_demo_spark.sources.zorder import write_zordered, zvalue
from tests.conftest import PARITY_SF_DIR

def _box(df):
    """Data-relative 2-d box: WIDE in l_partkey (90% of its span — the
    regime where a partkey sort order prunes nothing) and NARROW in
    l_suppkey (30%) — the multi-dimensional-workload case z-order exists
    for. Relative bounds keep the test meaningful at any PARITY_SF_DIR."""
    import pyspark.sql.functions as SF

    r = df.agg(
        SF.min("l_partkey"), SF.max("l_partkey"),
        SF.min("l_suppkey"), SF.max("l_suppkey"),
    ).first()
    p_lo, p_hi, s_lo, s_hi = r[0], r[1], r[2], r[3]
    p_span, s_span = p_hi - p_lo, s_hi - s_lo
    return {
        "l_partkey": (p_lo + p_span * 5 // 100, p_lo + p_span * 95 // 100),
        "l_suppkey": (s_lo + s_span * 10 // 100, s_lo + s_span * 40 // 100),
    }


def _files_overlapping_box(path: str, box) -> tuple[int, int]:
    """(files whose [min,max] stats intersect the box on BOTH columns,
    total files) — the footer-stats pruning decision an engine makes per
    file."""
    hits, total = 0, 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_idx = {md.row_group(0).column(i).path_in_schema: i
                      for i in range(md.row_group(0).num_columns)}
        file_min: dict[str, int] = {}
        file_max: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for col in box:
                st = md.row_group(rg).column(schema_idx[col]).statistics
                file_min[col] = min(file_min.get(col, st.min), st.min)
                file_max[col] = max(file_max.get(col, st.max), st.max)
        if all(
            file_min[c] <= hi and file_max[c] >= lo
            for c, (lo, hi) in box.items()
        ):
            hits += 1
    return hits, total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Lineitem re-clustered on the (l_partkey, l_suppkey) z-curve must
    leave FAR fewer files overlapping a 2-d box than the same data sorted
    by l_partkey alone: the linear layout's every partkey-selected file
    spans the full suppkey range, the z-layout's files cover small boxes
    of the plane."""
    li = load_table(spark, PARITY_SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "z")
    ldir = str(tmp_path / "linear")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], n_files=32)
    (
        li.repartitionByRange(32, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    box = _box(li)
    z_hits, z_total = _files_overlapping_box(zdir, box)
    l_hits, l_total = _files_overlapping_box(ldir, box)
    assert z_total >= 16 and l_total >= 16
    # the partkey sort order cannot prune a partkey-wide box: nearly every
    # linear file intersects it...
    assert l_hits >= l_total * 3 // 4, (l_hits, l_total)
    # ...while z-ordered files cover small boxes of the plane, so the
    # narrow suppkey side prunes most of them (generous 2x margin over the
    # ~40% a perfect grid would give — range-sampling boundaries wobble)
    assert z_hits <= l_hits * 3 // 4, (z_hits, z_total, l_hits, l_total)

    # and the data round-trips exactly
    assert (
        spark.read.parquet(zdir).count()
        == spark.read.parquet(ldir).count()
        == li.count()
    )


def test_zvalue_orders_locally(spark):
    """Sanity on the curve itself: equal points get equal z, and the
    z-value of a point dominated in both dimensions is strictly smaller."""
    df = spark.createDataFrame(
        [(0, 0), (3, 7), (1023, 1023)], "a INT, b INT"
    )
    rows = {
        (r["a"], r["b"]): r["__z"]
        for r in zvalue(df, ["a", "b"], bits=10).collect()
    }
    assert rows[(0, 0)] == 0
    assert rows[(0, 0)] < rows[(3, 7)] < rows[(1023, 1023)]


def test_zvalue_dominance_monotone_and_injective(spark):
    """Curve properties, property-tested: (a) componentwise dominance is
    preserved (a1<=a2 and b1<=b2 implies z1<=z2 — each coordinate's bits
    map to disjoint z positions in order, so each coordinate's
    contribution is monotone and the sum of monotone contributions is
    monotone); (b) the interleave is injective on the grid (distinct
    points, distinct z) — together these are what make footer min/max
    ranges on z meaningful boxes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduceindex_demo_spark.sources.zorder import interleave_bits

    # evaluate the interleave expression once over a driver-built frame
    # per example batch: hypothesis drives the data, Spark does the math
    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 1023), st.integers(0, 1023),
                st.integers(0, 1023), st.integers(0, 1023),
            ),
            min_size=1,
            max_size=32,
        )
    )
    def check(batch):
        df = spark.createDataFrame(batch, "a1 INT, b1 INT, a2 INT, b2 INT")
        rows = df.select(
            "a1", "b1", "a2", "b2",
            interleave_bits([F.col("a1"), F.col("b1")], bits=10).alias("z1"),
            interleave_bits([F.col("a2"), F.col("b2")], bits=10).alias("z2"),
        ).collect()
        for r in rows:
            if r["a1"] <= r["a2"] and r["b1"] <= r["b2"]:
                assert r["z1"] <= r["z2"], dict(r.asDict())
            if (r["a1"], r["b1"]) != (r["a2"], r["b2"]):
                assert r["z1"] != r["z2"], dict(r.asDict())

    check()


def test_zorder_three_dimensions(spark, tmp_path):
    """d=3 works end to end (3 x 16 bits fits a long): the write round-
    trips and every dominated triple keeps a smaller z."""
    from mapreduceindex_demo_spark.sources.zorder import interleave_bits

    li = load_table(spark, PARITY_SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_linenumber"
    )
    out = str(tmp_path / "z3")
    write_zordered(
        li, out, ["l_partkey", "l_suppkey", "l_linenumber"], n_files=16
    )
    assert spark.read.parquet(out).count() == li.count()

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 2, 3), (7, 7, 7)], "a INT, b INT, c INT"
    )
    rows = sorted(
        r["z"]
        for r in df.select(
            interleave_bits(
                [F.col("a"), F.col("b"), F.col("c")], bits=3
            ).alias("z")
        ).collect()
    )
    assert rows[0] == 0 and rows[0] < rows[1] < rows[2]
