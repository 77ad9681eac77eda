"""Golden semantics tests for the map-index core (SURVEY §5.2/§5.3):
emit fan-out, WHERE retraction, delete handling, incremental == rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.catalog import Catalog, IndexDefn
from mapreduceindex_demo_spark.mapindex import INCL_BOTH, INCL_LOW, MapIndexEngine
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import SMOKE_SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload string, v bigint, op string")


KV = IndexDefn(
    name="kv", bucket="t", sec_exprs=("payload", "v"), where_expr="v > 0"
)


def test_emit_fanout_and_empty_emit(spark):
    """One doc → N entries via a function index; [] ⇒ no entries; an
    erroring function is panic-safe (no entries, no crash)."""
    eng = MapIndexEngine(spark)

    def fanout(meta, doc):
        if doc["v"] == 13:
            raise RuntimeError("boom")  # must be swallowed
        return [(doc["payload"], i) for i in range(doc["v"])]

    eng.register_function("fanout", fanout)
    df = _docs(
        spark,
        [(1, "a", 2, "upsert"), (2, "b", 0, "upsert"), (3, "c", 13, "upsert")],
    )
    eng.create_index(
        IndexDefn(name="f", bucket="t", func_name="fanout",
                  key_types=("string", "bigint")),
        df,
        doc_id_col="doc_id",
    )
    rows = {tuple(r) for r in eng.index_table("f").collect()}
    assert rows == {("a", 0, 1), ("a", 1, 1)}


def test_where_filter_and_update_retraction(spark):
    """A doc updated to a WHERE-false value loses its entries (the
    reference's AddUpsertDeletion branch, indexjs.go:158-173)."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "upsert"), (2, "b", 7, "upsert")])
    eng.create_index(KV, df, doc_id_col="doc_id")
    assert eng.index_table("kv").count() == 2

    changes = _docs(spark, [(1, "a2", -1, "upsert")])  # now fails WHERE
    eng.apply_changes("kv", changes, doc_id_col="doc_id", op_col="op")
    rows = {tuple(r) for r in eng.index_table("kv").collect()}
    assert rows == {("b", 7, 2)}


def test_delete_and_last_op_wins(spark):
    """Deletes retract all entries; within a batch the highest-seq op per
    doc wins (per-partition seqno ordering, SURVEY §1.1)."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u"), (2, "b", 7, "u")])
    eng.create_index(
        IndexDefn(name="kv2", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    changes = spark.createDataFrame(
        [
            (1, "x", 9, "upsert", 10),
            (1, None, None, "delete", 11),  # later: delete wins
            (2, "c", 8, "delete", 20),
            (2, "c2", 9, "upsert", 21),  # later: upsert wins
        ],
        "doc_id bigint, payload string, v bigint, op string, seq bigint",
    )
    eng.apply_changes("kv2", changes, doc_id_col="doc_id", op_col="op", seq_col="seq")
    rows = {tuple(r) for r in eng.index_table("kv2").collect()}
    assert rows == {("c2", 9, 2)}


def test_immutable_skips_retraction(spark):
    """Immutable indexes append without the retraction anti-join
    (indexjs.go:158-160)."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u")])
    eng.create_index(
        IndexDefn(name="imm", bucket="t", sec_exprs=("payload",), immutable=True),
        df,
        doc_id_col="doc_id",
    )
    eng.apply_changes(
        "imm", _docs(spark, [(1, "a2", 6, "upsert")]), doc_id_col="doc_id", op_col="op"
    )
    assert eng.index_table("imm").count() == 2  # both versions retained


def test_incremental_equals_rebuild_property(spark):
    """THE invariant (SURVEY §5.3): replaying the events CDC in k batches
    ends in exactly the state of a from-scratch build on the final live
    versions — for several batch counts."""
    events = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "op", F.when(F.col("event_type") == "error", "delete").otherwise("upsert")
    )
    hi = events.agg(F.max("event_id")).collect()[0][0]

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    final_live = (
        events.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .drop("rn")
    )

    def defn(name):
        return IndexDefn(
            name=name,
            bucket="events",
            sec_exprs=("CAST(get_json_object(props,'$.k') AS BIGINT)", "event_type"),
            where_expr="value > 20",
        )

    eng = MapIndexEngine(spark)
    eng.create_index(defn("golden"), final_live, doc_id_col="user_id")
    golden = sorted(tuple(r) for r in eng.index_table("golden").collect())

    for nbatches in (2, 5):
        name = f"inc{nbatches}"
        eng2 = MapIndexEngine(spark)
        eng2.create_index(
            defn(name), events.limit(0).drop("op"), doc_id_col="user_id"
        )
        step = (hi + nbatches) // nbatches
        for b in range(nbatches):
            batch = events.filter(
                (F.col("event_id") >= b * step) & (F.col("event_id") < (b + 1) * step)
            )
            eng2.apply_changes(
                name, batch, doc_id_col="user_id", op_col="op", seq_col="event_id"
            )
        got = sorted(tuple(r) for r in eng2.index_table(name).collect())
        assert got == golden, f"incremental({nbatches}) != rebuild"


def test_scan_inclusion_and_desc(spark):
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, chr(97 + i), i, "u") for i in range(1, 6)])
    eng.create_index(
        IndexDefn(name="s", bucket="t", sec_exprs=("v",), desc=(True,)),
        df,
        doc_id_col="doc_id",
    )
    got = [r.key_0 for r in eng.scan("s", low=2, high=4, inclusion=INCL_BOTH).collect()]
    assert got == [4, 3, 2]  # declared DESC ordering
    got = [r.key_0 for r in eng.scan("s", low=2, high=4, inclusion=INCL_LOW,
                                     descending=False).collect()]
    assert got == [2, 3]


def test_stats_and_bins(spark):
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, "x", i % 10, "u") for i in range(100)])
    eng.create_index(
        IndexDefn(name="st", bucket="t", sec_exprs=("v",)), df, doc_id_col="doc_id"
    )
    stats = eng.stats("st").collect()[0]
    assert stats.entry_count == 100
    assert stats.min_key == 0 and stats.max_key == 9
    assert stats.distinct_keys == 10
    bins = {r.bin: r.cnt for r in eng.bins("st", n=5, lo=0, hi=10).collect()}
    assert sum(bins.values()) == 100 and len(bins) == 5


def test_partition_schemes(spark):
    """KEY/HASH/RANGE placement (P1/P2): declared partitioning reaches the
    physical plan; RANGE co-locates ordered key ranges."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, chr(97 + i % 26), i % 7, "u") for i in range(200)])
    for scheme in ("HASH", "RANGE"):
        eng.create_index(
            IndexDefn(
                name=f"p_{scheme}",
                bucket="t",
                sec_exprs=("v",),
                partition_scheme=scheme,
                partition_keys=("key_0",),
                num_partitions=4,
            ),
            df,
            doc_id_col="doc_id",
        )
        idx = eng.index_table(f"p_{scheme}")
        assert idx.rdd.getNumPartitions() == 4
        assert idx.count() == 200
    # RANGE: each key value lands in exactly one partition, and partitions
    # hold contiguous key ranges
    parts = (
        eng.index_table("p_RANGE")
        .rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, sorted({r["key_0"] for r in it}))]
        )
        .collect()
    )
    spans = [(p[1][0], p[1][-1]) for p in sorted(parts) if p[1]]
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_stats_approx_mode(spark):
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, "x", i % 10, "u") for i in range(1000)])
    eng.create_index(
        IndexDefn(name="ap", bucket="t", sec_exprs=("v",)), df, doc_id_col="doc_id"
    )
    row = eng.stats("ap", approx=True).collect()[0]
    assert row.entry_count == 1000
    # HLL estimate of 10 distinct values is exact at this cardinality
    assert 9 <= row.distinct_keys <= 11


def test_catalog_guards(spark):
    cat = Catalog()
    cat.register_function("f", lambda m, d: [])
    with pytest.raises(ValueError):
        cat.register_function("bad", "def not_on_map(): pass")
    cat.add_index(
        IndexDefn(name="i1", bucket="b", func_name="f", key_types=("string",))
    )
    with pytest.raises(ValueError):  # delete guard: function in use
        cat.delete_function("f")
    with pytest.raises(ValueError):  # equivalent-index dedup
        cat.add_index(
            IndexDefn(name="i2", bucket="b", func_name="f", key_types=("string",))
        )
    cat.drop_index("i1")
    cat.delete_function("f")  # now allowed
    # source-text registration with compile check
    cat.register_function("src", "def on_map(meta, doc):\n    return [(doc['x'],)]")
    assert cat.get_function("src").fn({}, {"x": 1}) == [(1,)]


def test_collated_scan_range_bounds(spark):
    """ADVICE r1: bounded scans on a collated index must bracket by the
    SAME order the index advertises — the binary sort_key — not raw key_0
    text ('10' < '9' lexicographically; cross-type bounds plain wrong).
    Checked against the spec comparator json_compare for all four
    inclusion combinations and cross-type bounds."""
    import json

    from mapreduceindex_demo_spark.collation import json_compare
    from mapreduceindex_demo_spark.mapindex import INCL_HIGH

    values = [None, False, True, -3, 2, 9, 10, 2.5, "9", "10", "abc", [1], [2, 0], {"a": 1}]
    rows = [(i, json.dumps(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "doc_id bigint, j string")
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="cr", bucket="t", sec_exprs=("j",), use_collation=True),
        df,
        doc_id_col="doc_id",
    )

    def expect(low, high, incl):
        out = []
        for v in values:
            ok = True
            if low is not None or low in (None,):
                pass
            if low is not None:
                c = json_compare(v, low)
                ok &= c > 0 or (c == 0 and bool(incl & INCL_LOW))
            if high is not None:
                c = json_compare(v, high)
                ok &= c < 0 or (c == 0 and bool(incl & INCL_HIGH))
            if ok:
                out.append(json.dumps(v))
        return sorted(out)

    cases = [
        (2, 10, INCL_BOTH),       # numeric: must include 9 and 10, not "9"/"10"
        (2, 10, 0),               # exclusive both
        (2, 10, INCL_LOW),
        (2, 10, INCL_HIGH),
        (9, "10", INCL_BOTH),     # cross-type: numbers 9,10 + string "10" yes, "9"? no ("10"<"9")
        (False, 2.5, INCL_BOTH),  # bool low → includes true and numbers <= 2.5
        (None, "abc", 0),         # null low exclusive → everything above null, below "abc"
    ]
    for low, high, incl in cases:
        got = sorted(
            r["key_0"]
            for r in eng.scan("cr", low=low, high=high, inclusion=incl).collect()
        )
        assert got == expect(low, high, incl), (low, high, incl, got)


def test_build_deferred_single_source_scan(spark):
    """Deferred indexes build in ONE source pass (reference: one INIT_STREAM
    per instance LIST, kv_sender.go:235-347): after build_deferred, every
    index's plan reads the materialized snapshot — zero file re-scans —
    and results equal individually-built indexes."""
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    eng = MapIndexEngine(spark)
    defs = [
        IndexDefn(name="d1", bucket="events", sec_exprs=("event_type",), deferred=True),
        IndexDefn(name="d2", bucket="events", sec_exprs=("user_id",), deferred=True),
        IndexDefn(name="d3", bucket="events", sec_exprs=("value", "event_type"), deferred=True),
    ]
    for d in defs:
        assert eng.create_index(d, ev, doc_id_col="event_id") is None
        assert (
            eng.engine_stats(d.name)[d.name]["status"] == MapIndexEngine.ST_CREATED
        )
    built = eng.build_deferred(ev, doc_id_col="event_id")
    assert set(built) == {"d1", "d2", "d3"}
    for n in built:
        plan = built[n]._jdf.queryExecution().executedPlan().toString()
        assert "parquet" not in plan.lower(), f"{n} re-scanned the source:\n{plan}"

    # parity with a direct (non-deferred) build
    eng2 = MapIndexEngine(spark)
    eng2.create_index(
        IndexDefn(name="solo", bucket="events", sec_exprs=("event_type",)),
        ev,
        doc_id_col="event_id",
    )
    a = sorted(map(tuple, built["d1"].collect()))
    b = sorted(map(tuple, eng2.index_table("solo").collect()))
    assert a == b

    # build_deferred on explicit names guards non-deferred indexes
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.build_deferred(ev, doc_id_col="event_id", names=["d1"])


def test_unknown_op_raises_not_silent_delete(spark):
    """ADVICE r1: a typo'd/NULL opcode must surface an error — r1 silently
    treated it as a delete and dropped index entries."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 2, "upsert"), (2, "b", 3, "upsert")])
    eng.create_index(
        IndexDefn(name="vop", bucket="t", sec_exprs=("payload",)),
        df,
        doc_id_col="doc_id",
    )
    bad = _docs(spark, [(1, "a", 2, "upsrt")])  # typo
    # the error may fire at plan time (constant folding over literal rows)
    # or at execution time — either way it must surface, never silently drop
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="unknown CDC op"):
        eng.apply_changes("vop", bad, doc_id_col="doc_id", op_col="op").collect()
    null_op = _docs(spark, [(2, "b", 3, None)])
    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="unknown CDC op"):
        eng.apply_changes("vop", null_op, doc_id_col="doc_id", op_col="op").collect()


def test_scan_routing_by_expression(spark):
    """Index selection (reference query-service planner): scans route by
    bucket + leading key expression, not index name; primary routes on
    None; unknown expressions raise with the available inventory."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, chr(97 + i), i * 10, "u") for i in range(5)])
    eng.create_index(
        IndexDefn(name="by_v", bucket="docs", sec_exprs=("v",)), df, doc_id_col="doc_id"
    )
    eng.create_index(
        IndexDefn(name="by_payload", bucket="docs", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    eng.create_index(
        IndexDefn(name="pk", bucket="docs", is_primary=True), df, doc_id_col="doc_id"
    )

    routed = eng.scan_by_expr("docs", "v", low=10, high=30).collect()
    direct = eng.scan("by_v", low=10, high=30).collect()
    assert sorted(map(tuple, routed)) == sorted(map(tuple, direct))
    assert [r.key_0 for r in routed] == [10, 20, 30]

    assert eng.scan_by_expr("docs", " V ").count() == 5  # normalized match
    assert eng.scan_by_expr("docs", None).count() == 5  # primary route

    with pytest.raises(KeyError, match="no index on bucket"):
        eng.scan_by_expr("docs", "no_such_col")


def test_composite_scan_bounds(spark):
    """Reference scans take COMPOSITE Low/High keys (index.go:137-156):
    multi-part bounds compare field-wise (struct order on plain indexes,
    encoded-prefix brackets on collated ones)."""
    import json

    eng = MapIndexEngine(spark)
    rows = [(i, chr(97 + i % 3), i % 4, "u") for i in range(12)]
    df = _docs(spark, rows)
    eng.create_index(
        IndexDefn(name="comp", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    got = {
        (r.key_0, r.key_1)
        for r in eng.scan(
            "comp", low=("a", 1), high=("b", 2), inclusion=INCL_BOTH
        ).collect()
    }
    expect = {
        (p, v)
        for (_, p, v, _) in rows
        if ("a", 1) <= (p, v) <= ("b", 2)
    }
    assert got == expect and got  # non-empty

    # exclusive composite bounds
    got_ex = {
        (r.key_0, r.key_1)
        for r in eng.scan("comp", low=("a", 1), high=("b", 2), inclusion=0).collect()
    }
    assert got_ex == {(p, v) for (_, p, v, _) in rows if ("a", 1) < (p, v) < ("b", 2)}

    # collated composite: mixed-type two-part keys
    vals = [(1, [10, "x"]), (2, [10, 2]), (3, ["9", "x"]), (4, [2, None])]
    cdf = spark.createDataFrame(
        [(i, json.dumps(a), json.dumps(b)) for i, (a, b) in vals],
        "doc_id bigint, j0 string, j1 string",
    )
    eng.create_index(
        IndexDefn(name="ccomp", bucket="t", sec_exprs=("j0", "j1"), use_collation=True),
        cdf,
        doc_id_col="doc_id",
    )
    # bracket [ [10,2] .. [10,"x"] ] inclusive: numbers < strings, so both
    # 10-leading entries qualify; ["9",...] (string 9) and [2,None] don't
    got_c = sorted(
        r.doc_id
        for r in eng.scan("ccomp", low=[10, 2], high=[10, "x"], inclusion=INCL_BOTH).collect()
    )
    assert got_c == [1, 2]
    # prefix bound: everything with leading part 10, exclusive-high on [10]
    got_p = sorted(r.doc_id for r in eng.scan("ccomp", high=[10], inclusion=0).collect())
    assert got_p == [4]  # only number 2 sorts below 10 (string "9" is above all numbers)


def test_scan_limit_projection_and_pagination(spark):
    """Scan Limit (TakeOrdered plan — no global sort exchange), scan-side
    projection, and keyset pagination via exclusive composite low bounds."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(i, chr(97 + i % 5), i, "u") for i in range(50)])
    eng.create_index(
        IndexDefn(name="pg", bucket="t", sec_exprs=("v",)), df, doc_id_col="doc_id"
    )

    page1 = eng.scan("pg", limit=10).collect()
    assert [r.key_0 for r in page1] == list(range(10))
    # keyset pagination: next page starts strictly after the last key seen
    from mapreduceindex_demo_spark.mapindex import INCL_HIGH
    page2 = eng.scan("pg", low=page1[-1].key_0, inclusion=INCL_HIGH, limit=10).collect()
    assert [r.key_0 for r in page2] == list(range(10, 20))

    plan = eng.scan("pg", limit=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    proj = eng.scan("pg", limit=3, projection=["doc_id"])
    assert proj.columns == ["doc_id"]
    with pytest.raises(KeyError, match="projection"):
        eng.scan("pg", projection=["nope"])


def test_reduce_view_incremental_equals_rebuild(spark):
    """IVM invariant: a reduce view maintained across CDC batches (upserts,
    deletes, group moves) equals a from-scratch GROUP BY over the final
    index — bit-exact, since the measures are exact-typed (long)."""
    eng = MapIndexEngine(spark)
    df = _docs(
        spark,
        [(1, "a", 5, "u"), (2, "a", 7, "u"), (3, "b", 2, "u"), (4, "b", 4, "u")],
    )
    eng.create_index(
        IndexDefn(name="kvrv", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "kvrv", ["key_0"], sum_col="key_1")

    batches = [
        [(1, "b", 6, "upsert")],                      # group move a→b
        [(2, None, None, "delete"), (5, "c", 9, "upsert")],  # delete + new grp
        [(3, None, None, "delete"), (4, None, None, "delete")],  # b emptied? no: doc1 now b
        [(1, None, None, "delete")],                  # now b IS empty
    ]
    for rows in batches:
        eng.apply_changes(
            "kvrv", _docs(spark, rows), doc_id_col="doc_id", op_col="op"
        )
        got = {tuple(r) for r in eng.reduce_view_table("rv").collect()}
        want = {
            tuple(r)
            for r in eng.index_table("kvrv")
            .groupBy("key_0")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("key_1").alias("total"))
            .collect()
        }
        assert got == want
    # zero-count groups must have been dropped, not kept at cnt=0
    final = {r["key_0"] for r in eng.reduce_view_table("rv").collect()}
    assert final == {"c"}


def test_reduce_view_guards(spark):
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u")])
    eng.create_index(
        IndexDefn(name="kvg", bucket="t", sec_exprs=("payload",)),
        df,
        doc_id_col="doc_id",
    )
    with pytest.raises(KeyError):
        eng.create_reduce_view("rv", "kvg", ["nope"])
    eng.create_reduce_view("rv", "kvg", ["key_0"])
    with pytest.raises(ValueError):
        eng.create_reduce_view("rv", "kvg", ["key_0"])  # duplicate name
    with pytest.raises(ValueError):
        eng.drop_index("kvg")  # dependent view blocks the drop (D5 rule)
    eng.drop_reduce_view("rv")
    eng.drop_index("kvg")  # now fine


def test_reduce_view_rebuild_resets(spark):
    """build() over new data resets dependent views to the new base."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u"), (2, "a", 3, "u")])
    eng.create_index(
        IndexDefn(name="kvr", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "kvr", ["key_0"], sum_col="key_1")
    eng.build("kvr", _docs(spark, [(9, "z", 1, "u")]), doc_id_col="doc_id")
    assert [tuple(r) for r in eng.reduce_view_table("rv").collect()] == [("z", 1, 1)]


def test_reduce_view_null_measure_retraction(spark):
    """SUM semantics under retraction: when a group's last NON-NULL measure
    is retracted, the served total must be NULL (what a rebuild's SUM
    gives), not the 0 a plain ± fold would leave."""
    eng = MapIndexEngine(spark)
    df = spark.createDataFrame(
        [(1, "g", 5, "u"), (2, "g", None, "u")],
        "doc_id bigint, payload string, v bigint, op string",
    )
    eng.create_index(
        IndexDefn(name="kvn", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "kvn", ["key_0"], sum_col="key_1")
    # retract the only non-null measure; the null-measure doc remains
    eng.apply_changes(
        "kvn",
        spark.createDataFrame(
            [(1, None, None, "delete")],
            "doc_id bigint, payload string, v bigint, op string",
        ),
        doc_id_col="doc_id",
        op_col="op",
    )
    rows = [tuple(r) for r in eng.reduce_view_table("rv").collect()]
    assert rows == [("g", 1, None)]


def test_inmemory_view_follows_durable_merge(spark, tmp_path):
    """An in-memory view on an index that becomes durable must track
    apply_changes_durable — the durable merge bypasses the delta fold, so
    the engine re-derives the view from the post-merge state."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u"), (2, "b", 7, "u")])
    eng.create_index(
        IndexDefn(name="kvd", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "kvd", ["key_0"], sum_col="key_1")
    eng.save_index("kvd", str(tmp_path / "kvd"), buckets=2)
    eng.apply_changes_durable(
        "kvd",
        _docs(spark, [(1, "a", 50, "upsert"), (3, "c", 1, "upsert")]),
        doc_id_col="doc_id",
        op_col="op",
    )
    got = {tuple(r) for r in eng.reduce_view_table("rv").collect()}
    assert got == {("a", 1, 50), ("b", 1, 7), ("c", 1, 1)}


def test_sketch_view_append_only_and_guard(spark):
    """Distinct-count (HLL sketch) view measures: admitted on an IMMUTABLE
    index only (sketches union, never delete), folded incrementally across
    append batches, exact at small cardinality; a mutable index is
    rejected with a pointer at the durable recompute path."""
    eng = MapIndexEngine(spark)
    df = _docs(spark, [(1, "a", 5, "u"), (2, "a", 5, "u"), (3, "b", 7, "u")])
    eng.create_index(
        IndexDefn(name="imm_sk", bucket="t", sec_exprs=("payload", "v"),
                  immutable=True),
        df,
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "imm_sk", ["key_0"], distinct_col="key_1")
    eng.apply_changes(
        "imm_sk",
        _docs(spark, [(4, "a", 9, "upsert"), (5, "b", 7, "upsert")]),
        doc_id_col="doc_id",
        op_col="op",
    )
    got = {tuple(r) for r in eng.reduce_view_table("rv").collect()}
    # a: values {5,5,9} → 2 distinct; b: {7,7} → 1 (exact at this size)
    assert got == {("a", 3, 2), ("b", 2, 1)}

    mut = MapIndexEngine(spark)
    mut.create_index(
        IndexDefn(name="mut_sk", bucket="t", sec_exprs=("payload", "v")),
        df,
        doc_id_col="doc_id",
    )
    with pytest.raises(ValueError, match="immutable"):
        mut.create_reduce_view("rv", "mut_sk", ["key_0"], distinct_col="key_1")


from hypothesis import given, settings
from hypothesis import strategies as st

#: one CDC op: (doc_id 0-5, group a-c or None, measure 0-9 or None, op)
_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        st.sampled_from(["upsert", "delete"]),
    ),
    min_size=1,
    max_size=6,
)


@given(batches=st.lists(_ops, min_size=1, max_size=3))
@settings(max_examples=10, deadline=None)
def test_reduce_view_random_cdc_equals_rebuild(spark, batches):
    """Property: for ANY sequence of CDC batches (upserts incl. group
    moves and NULL measures, deletes, repeated docs within a batch), the
    incrementally-folded view equals a from-scratch GROUP BY over the
    final index — the IVM algebra has no sequence-dependent state."""
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="kvp", bucket="t", sec_exprs=("payload", "v")),
        _docs(spark, [(1, "a", 1, "u"), (2, "b", 2, "u")]),
        doc_id_col="doc_id",
    )
    eng.create_reduce_view("rv", "kvp", ["key_0"], sum_col="key_1")
    for i, rows in enumerate(batches):
        changes = spark.createDataFrame(
            [(d, g, v, op, seq) for seq, (d, g, v, op) in enumerate(rows)],
            "doc_id bigint, payload string, v bigint, op string, seq bigint",
        )
        eng.apply_changes(
            "kvp", changes, doc_id_col="doc_id", op_col="op", seq_col="seq",
            checkpoint=False,
        )
    def _key(t):
        return tuple((x is None, str(x)) for x in t)

    got = sorted(
        (tuple(r) for r in eng.reduce_view_table("rv").collect()), key=_key
    )
    want = sorted(
        (
            tuple(r)
            for r in eng.index_table("kvp")
            .groupBy("key_0")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("key_1").alias("total"))
            .collect()
        ),
        key=_key,
    )
    assert got == want


@given(batches=st.lists(_ops, min_size=1, max_size=3))
@settings(max_examples=10, deadline=None)
def test_minmax_view_random_cdc_equals_rebuild(spark, batches):
    """The same any-sequence property for the OPT-IN measure class:
    a min/max view on a mutable index — whose retracted groups re-derive
    from the post-merge base while untouched groups fold — equals a
    from-scratch GROUP BY over the final index for ANY CDC sequence,
    including ones that retract the current extreme, move docs between
    groups (incl. NULL groups), and carry NULL measures."""
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="kvmm", bucket="t", sec_exprs=("payload", "v")),
        _docs(spark, [(1, "a", 1, "u"), (2, "b", 2, "u")]),
        doc_id_col="doc_id",
    )
    eng.create_reduce_view(
        "rvmm", "kvmm", ["key_0"], sum_col="key_1", minmax_col="key_1"
    )
    for rows in batches:
        changes = spark.createDataFrame(
            [(d, g, v, op, seq) for seq, (d, g, v, op) in enumerate(rows)],
            "doc_id bigint, payload string, v bigint, op string, seq bigint",
        )
        eng.apply_changes(
            "kvmm", changes, doc_id_col="doc_id", op_col="op", seq_col="seq",
            checkpoint=False,
        )

    def _key(t):
        return tuple((x is None, str(x)) for x in t)

    got = sorted(
        (tuple(r) for r in eng.reduce_view_table("rvmm").collect()), key=_key
    )
    want = sorted(
        (
            tuple(r)
            for r in eng.index_table("kvmm")
            .groupBy("key_0")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("key_1").alias("total"),
                F.min("key_1").alias("min_val"),
                F.max("key_1").alias("max_val"),
            )
            .collect()
        ),
        key=_key,
    )
    assert got == want


def test_serve_aggregate_routes_to_equivalent_view(spark):
    """The aggregate navigator (D4 lifted to views): an aggregate request
    matching a registered view's shape serves FROM the view; a request
    with no equivalent view computes ad-hoc over the index — identical
    output shape and values either way, including measure supersets
    (a cnt+sum+minmax view also serves a plain cnt+sum request)."""
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(name="nav", bucket="t", sec_exprs=("payload", "v")),
        _docs(spark, [(1, "a", 1, "u"), (2, "b", 2, "u"), (3, "a", 5, "u")]),
        doc_id_col="doc_id",
    )
    eng.create_reduce_view(
        "nv", "nav", ["key_0"], sum_col="key_1", minmax_col="key_1"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # exact match → routed
    full, hit = eng.serve_aggregate(
        "nav", ["key_0"], sum_col="key_1", minmax_col="key_1"
    )
    assert hit
    # measure-subset request → still routed, surplus projected away
    sub, hit2 = eng.serve_aggregate("nav", ["key_0"], sum_col="key_1")
    assert hit2
    assert sub.columns == ["key_0", "cnt", "total"]
    # no equivalent view (different group set) → ad-hoc fallback
    adhoc, hit3 = eng.serve_aggregate("nav", ["key_1"], sum_col="key_1")
    assert not hit3
    # both paths equal a from-scratch GROUP BY
    want_full = rows(
        eng.index_table("nav")
        .groupBy("key_0")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("key_1").alias("total"),
            F.min("key_1").alias("min_val"),
            F.max("key_1").alias("max_val"),
        )
    )
    assert rows(full) == want_full
    assert rows(sub) == [(g, c, t) for g, c, t, _, _ in want_full]
    want_adhoc = rows(
        eng.index_table("nav")
        .groupBy("key_1")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("key_1").alias("total"))
    )
    assert rows(adhoc) == want_adhoc
    # the routed path stays current: a CDC batch folds into the view and
    # the navigator serves the updated aggregate
    eng.apply_changes(
        "nav",
        spark.createDataFrame(
            [(3, None, None, "delete")],
            "doc_id bigint, payload string, v bigint, op string",
        ),
        doc_id_col="doc_id",
        op_col="op",
    )
    upd, hit4 = eng.serve_aggregate(
        "nav", ["key_0"], sum_col="key_1", minmax_col="key_1"
    )
    assert hit4
    assert rows(upd) == rows(
        eng.index_table("nav")
        .groupBy("key_0")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("key_1").alias("total"),
            F.min("key_1").alias("min_val"),
            F.max("key_1").alias("max_val"),
        )
    )
