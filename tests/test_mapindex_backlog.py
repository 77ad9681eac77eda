"""apply_backlog (catch-up merge, T2) must be exactly the fold of
apply_changes over the same micro-batches in order — the equivalence the
engine's CATCHUP fast path rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceindex_demo_spark.catalog import IndexDefn
from mapreduceindex_demo_spark.mapindex import MapIndexEngine
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import SMOKE_SF_DIR


def _cdc_events(spark):
    return load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", "delete").otherwise("upsert"),
    )


def _defn(name: str) -> IndexDefn:
    return IndexDefn(
        name=name,
        bucket="events",
        sec_exprs=(
            "CAST(get_json_object(props, '$.k') AS BIGINT)",
            "event_type",
        ),
    )


def _seed(eng: MapIndexEngine, name: str, batch0):
    from mapreduceindex_demo_spark.plans.mapindex_queries import _latest_live

    first = _latest_live(batch0, "user_id", "event_id", "op").drop("batch")
    eng.create_index(_defn(name), first, doc_id_col="user_id")


def test_backlog_equals_sequential_fold(spark):
    events = _cdc_events(spark)
    hi = events.agg(F.max("event_id")).first()[0]
    n_batches = 4
    step = (hi + n_batches) // n_batches or 1
    ev = events.withColumn(
        "batch", F.floor(F.col("event_id") / F.lit(step))
    ).localCheckpoint(eager=True)
    batch0 = ev.filter(F.col("batch") == 0)

    # literal fold: one apply_changes per batch, in order
    fold = MapIndexEngine(spark)
    _seed(fold, "idx_fold", batch0)
    for b in range(1, n_batches):
        fold.apply_changes(
            "idx_fold",
            ev.filter(F.col("batch") == b).drop("batch"),
            doc_id_col="user_id",
            op_col="op",
            seq_col="event_id",
        )

    # catch-up merge: the whole backlog in one call
    catch = MapIndexEngine(spark)
    _seed(catch, "idx_catch", batch0)
    catch.apply_backlog(
        "idx_catch",
        ev.filter(F.col("batch") >= 1),
        doc_id_col="user_id",
        op_col="op",
        seq_col="event_id",
        batch_col="batch",
        n_batches=n_batches - 1,
    )

    a = sorted(map(tuple, fold.index_table("idx_fold").collect()))
    b = sorted(map(tuple, catch.index_table("idx_catch").collect()))
    assert a == b
    assert len(a) > 0
    # the per-batch counter reflects the whole backlog
    assert catch._batches_applied["idx_catch"] == n_batches - 1


def test_backlog_delete_last_wins(spark):
    """A doc whose final backlog change is a delete must be absent, even if
    earlier backlog batches upserted it (retraction ordering)."""
    rows = [
        # (doc, seq, batch, k, op)
        (1, 1, 0, 10, "upsert"),
        (2, 2, 0, 20, "upsert"),
        (1, 3, 1, 11, "upsert"),   # doc 1 updated in batch 1...
        (1, 5, 2, 12, "delete"),   # ...then deleted in batch 2 → gone
        (2, 4, 1, 21, "delete"),   # doc 2 deleted in batch 1...
        (2, 6, 2, 22, "upsert"),   # ...then re-upserted in batch 2 → lives
        (3, 7, 2, 30, "upsert"),   # doc 3 born mid-backlog
    ]
    df = spark.createDataFrame(
        [
            (d, s, b, f'{{"k": {k}}}', "t", op)
            for d, s, b, k, op in rows
        ],
        "user_id long, event_id long, batch long, props string, "
        "event_type string, op string",
    )
    eng = MapIndexEngine(spark)
    seed = df.filter((F.col("batch") == 0) & (F.col("op") == "upsert")).drop(
        "op", "batch"
    )
    eng.create_index(_defn("idx_edge"), seed, doc_id_col="user_id")
    eng.apply_backlog(
        "idx_edge",
        df.filter(F.col("batch") >= 1),
        doc_id_col="user_id",
        op_col="op",
        seq_col="event_id",
        batch_col="batch",
    )
    got = {
        (r.key_0, r.doc_id) for r in eng.index_table("idx_edge").collect()
    }
    assert got == {(22, 2), (30, 3)}
