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


def test_streaming_countmin_state_survives_restart(spark, tmp_path):
    """The stateful count-min grid must survive a stream restart: two
    SEPARATE stream runs over one checkpoint (second run adds new files)
    must accumulate into the SAME cells as a single batch pass over
    everything — i.e. the sketch state is restored from the state store,
    not rebuilt from zero (which would undercount every carried cell)."""
    from aram_matchdata_etl_spark.operators.streaming_batch import countmin_sketch
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.stateful import (
        CM_BLOCK_W,
        streaming_countmin,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "cm_ckpt")
    out = str(tmp_path / "cm_out")

    docs = load_table(spark, SF_SMOKE, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    def run_once(batch_df):
        batch_df.coalesce(1).write.mode("append").parquet(src)
        words = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select(F.explode(F.split("text", " ")).alias("word"))
        )
        # the stateful operator runs in update mode; the parquet sink is
        # append-only, so emissions land via foreachBatch
        q = (
            streaming_countmin(words)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _eid: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(half_a)
    run_once(half_b)

    emitted = spark.read.parquet(out).toPandas()
    latest = emitted.sort_values("version").groupby(["seed", "block"]).tail(1)
    got = {}
    for r in latest.itertuples(index=False):
        for i, c in enumerate(r.cells):
            if c:
                got[(r.seed, r.block * CM_BLOCK_W + i)] = int(c)

    words_all = docs.select(F.explode(F.split("text", " ")).alias("word"))
    want = {(r.seed, r.cell): r.c for r in countmin_sketch(words_all).collect()}
    assert got == want
