"""Structured Streaming semantics tests (SURVEY.md §2.9): the live stream
forms must converge to their deterministic batch twins."""

from __future__ import annotations

import os
import tempfile

import pytest

from .conftest import SF_SMOKE

EVENTS_FILE = f"{SF_SMOKE}/events.parquet"


@pytest.fixture()
def events_dir(tmp_path):
    """The file stream source needs a directory: symlink the fixture in."""
    os.symlink(EVENTS_FILE, tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.fixture()
def estream(spark, events_dir):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import events_stream

    batch = load_table(spark, SF_SMOKE, "events")
    return events_stream(spark, events_dir, EVENTS_FILE), batch


def test_dedup_forever_matches_batch_semantics(spark, estream):
    """T4: streaming dropDuplicates keeps exactly one row per key."""
    from aram_matchdata_etl_spark.streaming.crawl import dedup_forever, run_to_completion

    stream, batch = estream
    run_to_completion(dedup_forever(stream, "user_id"), query_name="t4_out")
    got = spark.sql("SELECT user_id, COUNT(*) AS n FROM t4_out GROUP BY user_id")
    assert got.filter("n > 1").count() == 0
    n_users = batch.select("user_id").distinct().count()
    assert got.count() == n_users


def test_dedup_ttl_stream(spark, estream):
    """T5: TTL dedup emits at most one row per (key, watermark window);
    output is a subset of the input and covers every user."""
    from aram_matchdata_etl_spark.streaming.crawl import dedup_with_ttl, run_to_completion

    stream, batch = estream
    run_to_completion(dedup_with_ttl(stream, "user_id"), query_name="t5_out")
    out = spark.table("t5_out")
    n_in = batch.count()
    assert 0 < out.count() <= n_in
    assert out.select("user_id").distinct().count() == batch.select(
        "user_id"
    ).distinct().count()
    # dedup keyed rows must exist in the input (same event_ids)
    ids_out = {r.event_id for r in out.select("event_id").collect()}
    ids_in = {r.event_id for r in batch.select("event_id").collect()}
    assert ids_out <= ids_in


def test_windowed_counts_match_batch_oracle(spark, estream):
    """Streaming window agg == the oracle-checked batch twin
    (q_event_window_agg) on a finite input."""
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.streaming.crawl import run_to_completion, windowed_counts

    stream, _ = estream
    # complete mode: append-mode would withhold the final (un-closed)
    # window past the watermark on a finite input — that's correct
    # streaming semantics, but here we assert full equality
    run_to_completion(windowed_counts(stream), query_name="win_out", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win_out").collect()
    }
    want_df = all_queries()["q_event_window_agg"](spark, SF_SMOKE)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in want_df.collect()
    }
    assert got == want


def test_foreachbatch_upsert_idempotent(spark, events_dir):
    """T3/S7: running the upsert twice yields the same table (idempotence,
    the replace_one(upsert=True) guarantee)."""
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.atomic import read_current
    from aram_matchdata_etl_spark.streaming.crawl import (
        events_stream,
        run_to_completion,
        upsert_sink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        target = f"{tmp}/bronze"
        for _ in range(2):
            stream = events_stream(spark, events_dir, EVENTS_FILE)
            run_to_completion(
                stream, sink_fn=upsert_sink(target, ["user_id", "event_type"])
            )
        final = read_current(spark, target)
        from pyspark.sql import functions as F

        dupes = (
            final.groupBy("user_id", "event_type").count().filter(F.col("count") > 1)
        )
        assert dupes.count() == 0
        # last-writer-wins matches the batch twin q_idempotent_upsert
        from aram_matchdata_etl_spark.registry import all_queries

        want = all_queries()["q_idempotent_upsert"](spark, SF_SMOKE)
        assert final.count() == want.count()


def test_session_windows_match_batch_sessionize(spark, estream):
    """Streaming session_window produces the same (user, session) row
    counts as the oracle-checked batch lag+cumsum sessionization."""
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.streaming.crawl import run_to_completion, session_windows

    stream, _ = estream
    run_to_completion(
        session_windows(stream), query_name="sess_out", output_mode="complete"
    )
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.table("sess_out").collect()
    }
    want_df = all_queries()["q_sessionize"](spark, SF_SMOKE)
    want = {
        (r.user_id, r.session_start): r.n_events for r in want_df.collect()
    }
    assert got == want


def test_crawl_topology_end_to_end(spark):
    """EP1+EP2 batch form: seed users -> match ids -> bronze docs; the
    participant side-output feeds back more users than we seeded (the
    self-feeding BFS property, tasks.py:122-129)."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.sources.crawl_api import bronze_matches

    seeds = [1, 2, 3]
    bronze = bronze_matches(spark, seeds)
    rows = bronze.count()
    assert rows > 0
    # every doc is ARAM (the in-flight filter, tasks.py:136-139)
    assert bronze.filter(F.size("participants") != 10).count() == 0
    # feedback loop: discovered users outnumber the seeds
    users = bronze.select(F.explode("participant_puuids").alias("puuid")).distinct()
    assert users.count() > len(seeds)
    # idempotent key: one row per match id
    assert bronze.select("match_id").distinct().count() == rows


def test_observe_pipeline_counters(spark):
    """The reference's per-run counter dicts (tasks.py:174-180) as
    df.observe() metrics: counters ride the job, no second pass."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.match_pipeline import filtered_players
    from .conftest import SF_SMOKE

    obs = Observation("crawl_counters")
    # DISTINCT aggregates are disallowed in observed metrics; the HLL
    # sketch is the observable (and scale-correct) distinct counter
    df = filtered_players(spark, SF_SMOKE).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("match_id").alias("n_matches"),
    )
    n = df.count()
    assert obs.get["n_rows"] == n
    assert obs.get["n_matches"] > 0


def test_stream_stream_attribution_matches_batch(spark, events_dir):
    """The watermarked stream-stream join must produce exactly the
    matched (purchase, click) pairs the batch interval join computes."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.streaming.crawl import (
        attribution_join,
        events_stream,
        run_to_completion,
    )
    from .conftest import SF_SMOKE

    stream = events_stream(spark, events_dir, EVENTS_FILE)
    out = attribution_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
    )
    run_to_completion(out, query_name="attrib_sink")
    got = {
        (r.p_id, r.p_user, r.c_ts)
        for r in spark.sql("SELECT * FROM attrib_sink").collect()
    }

    batch = all_queries()["q_interval_join_binned"](spark, SF_SMOKE)
    want_counts = {
        (r.event_id, r.user_id): r.n_clicks
        for r in batch.filter("n_clicks > 0").collect()
    }
    # same purchases matched, same per-purchase click multiplicity
    from collections import Counter

    got_counts = Counter((p, u) for p, u, _ in got)
    assert dict(got_counts) == want_counts


def test_streaming_fingerprint_dedup_matches_batch_admission(spark, tmp_path):
    """The incremental-ingest admission semantic (q_dedup_incremental)
    holds on a LIVE stream: documents streamed through the content
    fingerprint + dropDuplicates admit exactly one doc per fingerprint,
    and the admitted fingerprint set equals the batch operator's — so a
    continuously-ingesting pipeline and a batch backfill converge."""
    import os as _os

    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.dedup import bow_fingerprint
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import (
        dedup_forever,
        run_to_completion,
    )

    docs_file = f"{SF_SMOKE}/documents.parquet"
    _os.symlink(docs_file, tmp_path / "documents.parquet")
    batch = load_table(spark, SF_SMOKE, "documents")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(str(tmp_path))
        .withColumn("fingerprint", bow_fingerprint())
    )
    run_to_completion(dedup_forever(stream, "fingerprint"), query_name="fp_out")
    got = spark.table("fp_out")
    assert got.groupBy("fingerprint").count().filter("count > 1").count() == 0
    want = (
        batch.select(bow_fingerprint().alias("fingerprint")).distinct().count()
    )
    assert got.count() == want
