"""Checkpointed stream recovery: dedup state survives a restart — the
exactly-once-ish replay guarantee the reference approximates with its
Redis SET + Mongo upsert (SURVEY §2.9 T3/T4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_dedup_state_survives_restart(spark, tmp_path):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import dedup_forever

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    events = load_table(spark, SF_SMOKE, "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events  # second batch REPLAYS half_a's users plus the rest

    def run_once(batch_df):
        batch_df.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dedup_forever(stream, "user_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(half_a)
    n_after_first = spark.read.parquet(out).count()
    assert n_after_first == half_a.select("user_id").distinct().count()

    run_once(half_b)
    final = spark.read.parquet(out)
    # state survived the restart: users seen in run 1 were NOT re-emitted,
    # so the output still has exactly one row per distinct user overall
    assert final.count() == events.select("user_id").distinct().count()
    dupes = final.groupBy("user_id").count().filter(F.col("count") > 1)
    assert dupes.count() == 0
