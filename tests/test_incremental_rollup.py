"""Incremental rollup: hour/day tables maintained across micro-batches
equal the one-shot batch aggregation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_incremental_rollup_equals_batch(spark, tmp_path):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.atomic import read_current
    from aram_matchdata_etl_spark.streaming.rollup import incremental_rollup_sink

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    # two source files => two micro-batches => the merge path is exercised
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hour_dir = str(tmp_path / "hour")
    day_dir = str(tmp_path / "day")
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(incremental_rollup_sink(hour_dir, day_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def canon(df):
        return {
            (r.bucket, r.event_type): (r.n, round(r.total, 4))
            for r in df.collect()
        }

    want_hour = canon(
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    want_day = canon(
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
        ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    assert canon(read_current(spark, hour_dir)) == want_hour
    assert canon(read_current(spark, day_dir)) == want_day


def test_incremental_hll_equals_batch(spark, tmp_path):
    """Streaming per-day HLL maintenance == the one-shot batch sketch:
    hll_union is register-wise max (order-insensitive, associative), so
    the trigger-at-a-time path must land on estimate-EXACT equality with
    q_hll_rollup's per-day rows, not just within-error agreement."""
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.atomic import read_current
    from aram_matchdata_etl_spark.streaming.rollup import incremental_hll_sink

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    day_dir = str(tmp_path / "day_hll")
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(incremental_hll_sink(day_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.day: (int(r.est), r.n_events)
        for r in read_current(spark, day_dir)
        .select(
            "day", F.expr("hll_sketch_estimate(sk)").alias("est"), "n_events"
        )
        .collect()
    }
    want = {
        r.day: (int(r.distinct_users), r.n_events)
        for r in all_queries()["q_hll_rollup"](spark, SF_SMOKE).collect()
        if r.day is not None
    }
    assert got == want
    assert len(got) > 1  # the fixture spans multiple days
