"""Property tests: the binary collation encoding is order-preserving w.r.t.
the cross-type collation spec MISSING < null < false < true < number <
string < array < object (reference JSEvaluate.go:56-130; SURVEY §1.3)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceindex_demo_spark.collation import (
    MISSING,
    collate_key,
    encode_value,
    json_compare,
    json_sort_key,
)

_nested = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=20),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=8,
)

# MISSING is a key-part-level sentinel ("expression evaluated to nothing");
# it never appears inside arrays/objects
json_values = st.one_of(st.just(MISSING), _nested)


@given(a=json_values, b=json_values)
@settings(max_examples=500, deadline=None)
def test_encoding_order_preserving(a, b):
    c = json_compare(a, b)
    ea, eb = encode_value(a), encode_value(b)
    if c < 0:
        assert ea < eb, (a, b)
    elif c > 0:
        assert ea > eb, (a, b)
    else:
        assert ea == eb, (a, b)


@given(vals=st.lists(json_values, min_size=2, max_size=8))
@settings(max_examples=200, deadline=None)
def test_sorting_by_bytes_matches_spec_sort(vals):
    by_bytes = sorted(vals, key=encode_value)
    by_spec = sorted(vals, key=json_sort_key)
    # both orders must agree up to spec-equality
    for x, y in zip(by_bytes, by_spec):
        assert json_compare(x, y) == 0


def test_cross_type_order_explicit():
    ordered = [
        MISSING,
        None,
        False,
        True,
        -1.5,
        2,
        10,
        "",
        "a",
        "a\x00b",
        "ab",
        [1],
        [1, 2],
        {"a": 1},
    ]
    encs = [encode_value(v) for v in ordered]
    assert encs == sorted(encs)
    assert all(encs[i] < encs[i + 1] for i in range(len(encs) - 1))


def test_ints_and_floats_interleave():
    assert encode_value(1.5) < encode_value(2) < encode_value(2.5) < encode_value(10)


def test_composite_keys_compare_fieldwise():
    assert collate_key([1, "b"]) < collate_key([2, "a"])
    assert collate_key([1, "a"]) < collate_key([1, "b"])
    assert collate_key([1]) < collate_key([1, None])  # shorter array first


def test_non_finite_rejected():
    with pytest.raises(ValueError):
        encode_value(float("nan"))
    with pytest.raises(ValueError):
        encode_value(float("inf"))


def test_engine_path_missing_below_null(spark):
    """ADVICE r1: a key expression evaluating to SQL NULL (field absent ⇒
    reference MISSING) must collate BELOW an explicit json null — the two
    are distinct all the way through the engine's scan order."""
    from mapreduceindex_demo_spark.catalog import IndexDefn
    from mapreduceindex_demo_spark.mapindex import MapIndexEngine

    df = spark.createDataFrame(
        [(1, '"z"'), (2, "null"), (3, None), (4, "0")],
        "doc_id bigint, j string",
    )
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="mn", bucket="t", sec_exprs=("j",), use_collation=True),
        df,
        doc_id_col="doc_id",
    )
    order = [r.doc_id for r in eng.scan("mn").collect()]
    # MISSING(3) < null(2) < number 0(4) < string "z"(1)
    assert order == [3, 2, 4, 1]
