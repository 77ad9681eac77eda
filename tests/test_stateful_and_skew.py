"""applyInPandasWithState operator (T5) and the salted skew join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduceindex_demo_spark.operators.skew import salted_join
from mapreduceindex_demo_spark.session import load_table
from mapreduceindex_demo_spark.streaming.stateful import running_user_counters
from tests.conftest import SMOKE_SF_DIR


def test_stateful_counters_across_batches(spark, tmp_path):
    """State persists across micro-batches: after replaying events in 3
    files, final per-user counters equal the batch aggregation."""
    events = load_table(spark, SMOKE_SF_DIR, "events").select(
        "user_id", "event_id", "value", "ts"
    )
    src = str(tmp_path / "src")
    hi = events.agg(F.max("event_id")).collect()[0][0]
    step = (hi + 3) // 3
    for b in range(3):
        p = os.path.join(src, f"b{b}")
        events.filter(
            (F.col("event_id") >= b * step) & (F.col("event_id") < (b + 1) * step)
        ).coalesce(1).write.mode("overwrite").parquet(p)
        for root, _, names in os.walk(p):
            for nm in names:
                os.utime(os.path.join(root, nm), (1_700_000_000 + b,) * 2)

    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    q = (
        running_user_counters(stream)
        .writeStream.format("memory")
        .queryName("counters")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode re-emits per batch: keep the last emission per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("last_event_id"))
    got = {
        (r.user_id, r.events_seen, round(r.value_sum, 2), r.last_event_id)
        for r in spark.table("counters")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }
    expected = {
        (r.user_id, r.cnt, round(r.sv, 2), r.last)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sv"),
            F.max("event_id").alias("last"),
        )
        .collect()
    }
    assert got == expected


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join on a skewed key distribution."""
    li = load_table(spark, SMOKE_SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = load_table(spark, SMOKE_SF_DIR, "supplier")
    skewed = li.withColumn(  # ~half the rows hammer supplier 1
        "l_suppkey",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("l_suppkey")),
    )
    plain = skewed.join(sup, skewed.l_suppkey == sup.s_suppkey).select(
        "l_orderkey", "l_suppkey", "s_name"
    )
    salted = salted_join(
        skewed.withColumnRenamed("l_suppkey", "k"),
        sup.withColumnRenamed("s_suppkey", "k"),
        on="k",
        salts=4,
    ).select("l_orderkey", F.col("k").alias("l_suppkey"), "s_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """Spark 4's transformWithStateInPandas must reach the SAME final
    per-user state as the applyInPandasWithState operator over the same
    3-file micro-batched replay (and both equal the batch aggregation).

    The operator's state-server protocol needs a working google.protobuf;
    environments without it (this container) skip — the operator itself
    is plain public API and runs wherever protobuf is installed."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mapreduceindex_demo_spark.streaming.stateful import (
        running_user_counters_tws,
    )

    events = load_table(spark, SMOKE_SF_DIR, "events").select(
        "user_id", "event_id", "value", "ts"
    )
    src = str(tmp_path / "src")
    hi = events.agg(F.max("event_id")).collect()[0][0]
    step = (hi + 3) // 3
    for b in range(3):
        p = os.path.join(src, f"b{b}")
        events.filter(
            (F.col("event_id") >= b * step) & (F.col("event_id") < (b + 1) * step)
        ).coalesce(1).write.mode("overwrite").parquet(p)
        for root, _, names in os.walk(p):
            for nm in names:
                os.utime(os.path.join(root, nm), (1_700_000_000 + b,) * 2)

    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, value double, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    # transformWithState requires the RocksDB state store provider
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_user_counters_tws(stream)
            .writeStream.format("memory")
            .queryName("counters_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("last_event_id"))
    got = {
        (r.user_id, r.events_seen, round(r.value_sum, 2), r.last_event_id)
        for r in spark.table("counters_tws")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }
    expected = {
        (r.user_id, r.cnt, round(r.sv, 2), r.last)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sv"),
            F.max("event_id").alias("last"),
        )
        .collect()
    }
    assert got == expected and len(got) > 0


def test_runtime_bloom_filter_semi_join_pushdown(spark):
    """Runtime row-level filtering (Spark's runtime bloom filter) is ON in
    the engine session: for a selective shuffle join it builds a bloom
    filter from the filtered side and applies might_contain at the fact
    scan — semi-join pushdown that prunes shuffle input at 100 TB. The
    default thresholds (creation side <=10MB, application side >=10GB) are
    the correct at-scale gates; this test lowers the application-side gate
    to simulate the big-fact condition at test SF."""
    import re

    from pyspark.sql import functions as F

    from mapreduceindex_demo_spark.session import load_table
    from tests.conftest import PARITY_SF_DIR

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, PARITY_SF_DIR, "lineitem")
        od = load_table(spark, PARITY_SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert re.search("bloom", plan, re.I), plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
