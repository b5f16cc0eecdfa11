"""Custom Python DataSource (riot_matches): batch partitioning, schema,
determinism, and streaming offset/rate-limit/replay semantics."""

from __future__ import annotations

import pytest

import time


def _register(spark):
    from aram_matchdata_etl_spark.sources.riot_datasource import RiotMatchDataSource

    spark.dataSource.register(RiotMatchDataSource)


@pytest.mark.slow
def test_batch_read_schema_and_partitioning(spark):
    from aram_matchdata_etl_spark.sources.crawl_api import MATCHES_PER_USER

    _register(spark)
    df = (
        spark.read.format("riot_matches")
        .option("n_users", 20)
        .option("slice", 8)
        .load()
    )
    assert df.columns == [
        "user_id",
        "match_id",
        "game_mode",
        "game_duration",
        "detail_json",
        "timeline_json",
    ]
    assert df.count() == 20 * MATCHES_PER_USER
    # fan-out is distributed: ceil(20/8) = 3 input partitions
    assert df.rdd.getNumPartitions() == 3


def test_batch_read_deterministic(spark):
    _register(spark)
    read = lambda: sorted(
        (r.user_id, r.match_id, r.detail_json)
        for r in spark.read.format("riot_matches").option("n_users", 5).load().collect()
    )
    assert read() == read()


def test_batch_source_predicate_prunes_rows(spark):
    _register(spark)
    df = (
        spark.read.format("riot_matches")
        .option("n_users", 20)
        .load()
        .filter("game_mode = 'ARAM'")
    )
    modes = {r.game_mode for r in df.collect()}
    assert modes == {"ARAM"}


def test_stream_rate_limit_and_replay(spark, tmp_path):
    """Each micro-batch admits at most users_per_batch users, the stream
    drains the whole user space, and rows are never duplicated — the
    reference's beat-bounded crawl (tasks.py:18,45) as offset ranges."""
    from aram_matchdata_etl_spark.sources.crawl_api import MATCHES_PER_USER

    _register(spark)
    stream = (
        spark.readStream.format("riot_matches")
        .option("n_users", 12)
        .option("users_per_batch", 5)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("riot_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM riot_stream_sink").first().c
            if n >= 12 * MATCHES_PER_USER:
                break
            time.sleep(1)
        out = spark.sql(
            "SELECT user_id, match_id FROM riot_stream_sink"
        ).collect()
    finally:
        q.stop()
    assert len(out) == 12 * MATCHES_PER_USER
    assert len({(r.user_id, r.match_id) for r in out}) == len(out)
    assert {r.user_id for r in out} == set(range(12))


@pytest.mark.slow
def test_stream_source_to_bronze_upsert(spark, tmp_path):
    """EP2 end-to-end on the custom source: stream riot_matches → parse
    detail JSON against the bronze schema → ARAM filter → idempotent
    versioned upsert keyed by match_id. The final table must equal the
    batch-computed bronze from the same source (streaming/batch parity),
    with exactly one row per match id despite ids repeating across users."""
    import time

    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.sources.crawl_api import DETAIL_SCHEMA
    from aram_matchdata_etl_spark.streaming.atomic import read_current
    from aram_matchdata_etl_spark.streaming.crawl import upsert_sink

    _register(spark)
    target = str(tmp_path / "bronze")

    def bronze(df):
        parsed = df.withColumn("doc", F.from_json("detail_json", DETAIL_SCHEMA))
        return parsed.filter(F.col("doc.info.gameMode") == "ARAM").select(
            F.col("doc.metadata.matchId").alias("match_id"),
            F.col("doc.info.gameDuration").alias("game_duration"),
            F.size("doc.info.participants").alias("n_participants"),
            "detail_json",
            "timeline_json",
        )

    stream = (
        spark.readStream.format("riot_matches")
        .option("n_users", 8)
        .option("users_per_batch", 3)
        .load()
    )
    q = (
        bronze(stream)
        .writeStream.outputMode("update")
        .foreachBatch(upsert_sink(target, ["match_id"], order_cols=("match_id",)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    batch = bronze(
        spark.read.format("riot_matches").option("n_users", 8).load()
    ).dropDuplicates(["match_id"])
    want = batch.count()
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            cur = read_current(spark, target)
            if cur is not None and cur.count() == want:
                break
            time.sleep(1)
        final = read_current(spark, target)
        got = {
            (r.match_id, r.game_duration, r.n_participants)
            for r in final.collect()
        }
    finally:
        q.stop()
    assert len(got) == want
    assert got == {
        (r.match_id, r.game_duration, r.n_participants) for r in batch.collect()
    }


from aram_matchdata_etl_spark.sources.riot_datasource import Transport


class InjectedTransport(Transport):
    """Injectable transport double: two users, one shared match — proves the
    source calls through the seam (not the module-level fakes) and that a
    live client would slot in as one constructor/option change. Must be a
    module-level class: the Python data source initializes its reader in a
    separate worker process that re-imports this module by dotted path."""

    def match_ids(self, user_id):
        return [f"INJ_{user_id}", "INJ_SHARED"]

    def match_detail(self, match_id):
        return {
            "metadata": {"matchId": match_id},
            "info": {"gameMode": "ARAM", "gameDuration": 1234},
        }

    def match_timeline(self, match_id):
        return {"metadata": {"matchId": match_id}, "info": {"frames": []}}


def test_batch_read_with_injected_transport(spark):
    """The transport option swaps the fetch implementation end-to-end:
    rows coming back are the double's, not the default fake's."""
    _register(spark)
    df = (
        spark.read.format("riot_matches")
        .option("n_users", 2)
        .option("transport", f"{__name__}:InjectedTransport")
        .load()
    )
    rows = sorted((r.user_id, r.match_id, r.game_duration) for r in df.collect())
    assert rows == [
        (0, "INJ_0", 1234),
        (0, "INJ_SHARED", 1234),
        (1, "INJ_1", 1234),
        (1, "INJ_SHARED", 1234),
    ]


def test_stream_cursor_monotone_across_restart():
    """Restart-from-checkpoint semantics (unit-level, no engine): a fresh
    reader whose in-memory cursor restarted at 0 must clamp forward when
    the engine replays/commits batches planned from the checkpoint, so
    latestOffset never goes backwards and never re-admits committed
    ranges."""
    from aram_matchdata_etl_spark.sources.riot_datasource import RiotStreamReader

    opts = {"n_users": "20", "users_per_batch": "5"}
    # engine restored a checkpoint with committed end offset {"user": 10}
    r = RiotStreamReader(opts)
    r.partitions({"user": 5}, {"user": 10})  # pending-batch replay
    assert r.latestOffset() == {"user": 15}  # monotone: 10 + 5, not 0 + 5

    r2 = RiotStreamReader(opts)
    r2.commit({"user": 10})  # commit arrives before any planning
    assert r2.latestOffset() == {"user": 15}
