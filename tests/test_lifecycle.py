"""Index lifecycle, consistency levels, xattr retention, observability
(SURVEY §2.5 T2/T3, §2.2 M8, §2.6 D6/D9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.catalog import IndexDefn
from mapreduceindex_demo_spark.mapindex import MapIndexEngine


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, payload string, v bigint, op string"
    )


def test_deferred_build_lifecycle(spark):
    """deferred=True → CREATED, unscannable; build() → ACTIVE (T2/D6)."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u")])
    out = eng.create_index(
        IndexDefn(name="d", bucket="t", sec_exprs=("payload",), deferred=True),
        df,
        doc_id_col="doc_id",
    )
    assert out is None
    assert eng.engine_stats("d")["d"]["status"] == "CREATED"
    with pytest.raises(KeyError):
        eng.index_table("d")
    eng.build("d", df, doc_id_col="doc_id")
    assert eng.engine_stats("d")["d"]["status"] == "ACTIVE"
    assert eng.index_table("d").count() == 1


def test_consistency_levels(spark):
    """'any' scans stale state; 'session'/'query' drain queued CDC first
    (the reference's timestamp-vector stability barrier, T3)."""
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="c", bucket="t", sec_exprs=("v",)),
        _docs(spark, [(1, "a", 5, "u")]),
        doc_id_col="doc_id",
    )
    eng.enqueue_changes(
        "c",
        _docs(spark, [(2, "b", 9, "upsert")]),
        doc_id_col="doc_id",
        op_col="op",
    )
    assert eng.pending_count("c") == 1
    assert eng.scan("c", consistency="any").count() == 1  # stale ok
    assert eng.scan("c", consistency="session").count() == 2  # barrier
    assert eng.pending_count("c") == 0
    assert eng.engine_stats("c")["c"]["batches_applied"] == 1
    with pytest.raises(ValueError):
        eng.scan("c", consistency="bogus")


def test_retain_deleted_xattr(spark):
    """M8 (indexjs.go:92-99): a delete carrying xattrs is treated as a
    mutation when the index opts in; a bare delete still deletes."""
    eng = MapIndexEngine(spark)
    base = _docs(spark, [(1, "a", 5, "u"), (2, "b", 6, "u")])
    eng.create_index(
        IndexDefn(
            name="x", bucket="t", sec_exprs=("payload",), retain_deleted_xattr=True
        ),
        base,
        doc_id_col="doc_id",
    )
    changes = spark.createDataFrame(
        [
            (1, "a_tomb", 0, "delete", "sync-meta"),  # xattr'd delete → mutation
            (2, "b_tomb", 0, "delete", None),  # bare delete → delete
        ],
        "doc_id bigint, payload string, v bigint, op string, xattrs string",
    )
    eng.apply_changes(
        "x", changes, doc_id_col="doc_id", op_col="op", xattr_col="xattrs"
    )
    rows = {tuple(r) for r in eng.index_table("x").collect()}
    assert rows == {("a_tomb", 1)}


def test_register_function_from_file(spark, tmp_path):
    """Reference iteration-1 JSPath flow (kv_sender.go:1168-1176): load the
    map function from a source file, same compile-check, then build an
    index through it."""
    from mapreduceindex_demo_spark.catalog import IndexDefn
    from mapreduceindex_demo_spark.mapindex import MapIndexEngine

    src = tmp_path / "by_type.py"
    src.write_text(
        "def on_map(meta, doc):\n"
        "    return [(doc['payload'].upper(), doc['v'])]\n"
    )
    eng = MapIndexEngine(spark)
    eng.register_function_from_file("by_type", str(src))
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 7)], "doc_id bigint, payload string, v bigint"
    )
    eng.create_index(
        IndexDefn(
            name="ff", bucket="t", func_name="by_type",
            key_types=("string", "bigint"),
        ),
        df,
        doc_id_col="doc_id",
    )
    rows = {tuple(r) for r in eng.index_table("ff").collect()}
    assert rows == {("A", 5, 1), ("B", 7, 2)}

    # compile-check still applies to files
    bad = tmp_path / "bad.py"
    bad.write_text("def not_on_map(): pass\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="on_map"):
        eng.register_function_from_file("bad", str(bad))


def test_view_consistency_barrier(spark):
    """T3 for reduce views: 'any' serves the stale aggregate; 'query'
    drains the index's queued CDC first, and each drained batch folds its
    delta into the view before the read."""
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="cv", bucket="t", sec_exprs=("payload", "v")),
        _docs(spark, [(1, "a", 5, "u")]),
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "cv", ["key_0"], sum_col="key_1")
    eng.enqueue_changes(
        "cv",
        _docs(spark, [(2, "a", 9, "upsert")]),
        doc_id_col="doc_id",
        op_col="op",
    )
    assert [tuple(r) for r in eng.reduce_view_table("rv").collect()] == [
        ("a", 1, 5)
    ]  # stale ok
    assert [tuple(r) for r in eng.reduce_view_table("rv", consistency="query").collect()] == [
        ("a", 2, 14)
    ]  # barrier drained + folded
    with pytest.raises(ValueError):
        eng.reduce_view_table("rv", consistency="bogus")
