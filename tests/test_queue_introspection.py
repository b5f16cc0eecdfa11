"""S11 (queue introspection/reset) + the rate-limited Transport:

- ``queue_stats`` maps StreamingQuery progress onto the reference's
  queue_size()/set_size() probes (extractor/riot/db/redis.py:92-109).
- ``reset_queue`` is the reference's queue.clear() (main.py:6-18).
- ``RateLimitedTransport`` enforces the 2,000-req/2-min window and the
  200-req/1-s burst cap (tasks.py:18-19) with an injected clock, so the
  admission-control math is asserted exactly, without wall-clock waits.
"""

from __future__ import annotations

import os

import pytest

from .conftest import SF_SMOKE

EVENTS_FILE = f"{SF_SMOKE}/events.parquet"


class FakeClock:
    """Deterministic clock: time advances ONLY via sleep()."""

    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, dt: float) -> None:
        assert dt > 0
        self.sleeps.append(dt)
        self.t += dt


def _limiter(clock: FakeClock):
    from aram_matchdata_etl_spark.sources.riot_datasource import (
        FakeTransport,
        RateLimitedTransport,
    )

    return RateLimitedTransport(
        inner=FakeTransport(), clock=clock.clock, sleep=clock.sleep
    )


def test_burst_cap_admits_200_per_second():
    """First 200 requests are immediate; request 201 waits for the 1-s
    burst window to slide (BATCH_SIZE=200, tasks.py:19)."""
    clk = FakeClock()
    t = _limiter(clk)
    for _ in range(200):
        t._acquire()
    assert clk.t == 0.0  # no waiting within the burst
    t._acquire()  # 201st
    assert clk.t == pytest.approx(1.0, abs=1e-3)
    assert t.admitted == 201


def test_window_cap_admits_2000_per_2min():
    """2,000 requests fill the 2-minute window (200 up-front burst, then
    the amortized 2000/120s token rate -> ~108 s); request 2,001 must wait
    until the FIRST admission ages out of the window at t=120
    (MAX_REQUESTS_PER_2MIN=2000, tasks.py:18)."""
    clk = FakeClock()
    t = _limiter(clk)
    for _ in range(2000):
        t._acquire()
    assert clk.t < 120.0  # amortized pacing: ~108 s, still inside window
    t._acquire()  # 2,001st: window full
    assert clk.t == pytest.approx(120.0, abs=1e-2)
    # steady state: the NEXT 199 share the burst-second at t=120
    for _ in range(199):
        t._acquire()
    assert clk.t == pytest.approx(120.0, abs=1e-2)
    assert t.admitted == 2200
    assert t.waited_s > 0


def test_fresh_instances_cannot_reburst_window_quota():
    """ADVICE r4 (medium): Spark re-creates the pickled transport for every
    partition task and micro-batch trigger, each starting with an empty
    window. With amortized pacing (default) a FRESH instance admits at most
    burst + rate*T in its first T seconds — so k re-instantiations inside
    one 2-minute window overshoot the steady-state quota by at most k
    bursts (k*200), never k*2000. Here: two consecutive instances over one
    120 s window stay at 2000 + 2 bursts = 2400 (vs 4000 un-amortized)."""
    from aram_matchdata_etl_spark.sources.riot_datasource import (
        FakeTransport,
        RateLimitedTransport,
    )

    clk = FakeClock()
    total = 0
    # two instance lifetimes of 60 s each — e.g. two micro-batch triggers
    for _ in range(2):
        t = RateLimitedTransport(
            inner=FakeTransport(), clock=clk.clock, sleep=clk.sleep
        )
        t0 = clk.t
        while clk.t - t0 < 60.0:
            t._acquire()
            total += 1
        total -= 1  # the last acquire crossed the 60 s boundary
    # fleet-rate bound over the 120 s window: steady-state quota plus one
    # burst PER instance — NOT 2 x 2000
    assert total <= 2000 + 2 * 200, total
    # and amortization does not starve: at least the steady-state rate
    assert total >= 1800, total


def test_legacy_mode_allows_full_window_burst():
    """amortized=False preserves the reference's literal single-process
    semantics: 2000 admissions in ~9 s (200/s burst pacing only)."""
    from aram_matchdata_etl_spark.sources.riot_datasource import (
        FakeTransport,
        RateLimitedTransport,
    )

    clk = FakeClock()
    t = RateLimitedTransport(
        inner=FakeTransport(), clock=clk.clock, sleep=clk.sleep, amortized=False
    )
    for _ in range(2000):
        t._acquire()
    assert clk.t == pytest.approx(9.0, abs=0.1)


def test_rate_limited_transport_returns_inner_results():
    """Pacing must not change fetch results: rate-limited fetches equal
    the bare FakeTransport fetches, and every fetch is admitted."""
    from aram_matchdata_etl_spark.sources.riot_datasource import FakeTransport

    clk = FakeClock()
    t = _limiter(clk)
    bare = FakeTransport()
    ids = t.match_ids(7)
    assert list(ids) == list(bare.match_ids(7))
    mid = ids[0]
    assert t.match_detail(mid) == bare.match_detail(mid)
    assert t.match_timeline(mid) == bare.match_timeline(mid)
    assert t.admitted == 3


def test_stream_reader_through_rate_limited_transport(spark, tmp_path):
    """The stream reader accepts the rate-limited transport via the
    string-only option map and produces identical rows to the fake
    transport (55 requests at n_users=5 stay under the burst cap, so the
    real clock never sleeps)."""
    from aram_matchdata_etl_spark.sources.crawl_api import MATCHES_PER_USER
    from aram_matchdata_etl_spark.sources.riot_datasource import RiotMatchDataSource

    spark.dataSource.register(RiotMatchDataSource)
    stream = (
        spark.readStream.format("riot_matches")
        .option("n_users", 5)
        .option("users_per_batch", 5)
        .option(
            "transport",
            "aram_matchdata_etl_spark.sources.riot_datasource:RateLimitedFakeTransport",
        )
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rl_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT user_id, match_id FROM rl_sink").collect()
    assert len(got) == 5 * MATCHES_PER_USER
    plain = spark.read.format("riot_matches").option("n_users", 5).load()
    assert sorted((r.user_id, r.match_id) for r in got) == sorted(
        (r.user_id, r.match_id)
        for r in plain.select("user_id", "match_id").collect()
    )


@pytest.fixture()
def events_dir(tmp_path):
    os.symlink(EVENTS_FILE, tmp_path / "events.parquet")
    return str(tmp_path)


def test_queue_stats_and_reset(spark, events_dir, tmp_path):
    """S11 end-to-end: drive the dedup crawl stream, read LLEN/SCARD
    analogues off StreamingQuery progress, then clear the queue (=
    checkpoint) and verify a restart reprocesses from scratch."""
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import (
        dedup_forever,
        events_stream,
        queue_stats,
        reset_queue,
    )

    batch = load_table(spark, SF_SMOKE, "events")
    n_rows = batch.count()
    n_users = batch.select("user_id").distinct().count()
    ckpt = str(tmp_path / "ckpt")

    def run(sink_rows: list):
        # foreachBatch (not memory sink: that one cannot recover from a
        # checkpoint) — mirrors the real upsert topology anyway
        stream = events_stream(spark, events_dir, EVENTS_FILE)
        q = (
            dedup_forever(stream, "user_id")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _eid: sink_rows.append(b.count()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    out1: list = []
    q = run(out1)
    stats = queue_stats(q)
    # LLEN drain view: every fixture row entered the stream
    assert stats["batches"] >= 1
    assert stats["input_rows"] == n_rows
    # SCARD view: dedup state holds exactly one key per user
    assert stats["state_rows"] == n_users
    assert sum(out1) == n_users

    # restart WITHOUT reset: offsets committed, nothing new to process
    out2: list = []
    q2 = run(out2)
    assert queue_stats(q2)["input_rows"] == 0
    assert sum(out2) == 0

    # reset_queue = queue.clear(): restart reprocesses everything
    reset_queue(ckpt)
    assert not os.path.exists(ckpt)
    out3: list = []
    q3 = run(out3)
    assert queue_stats(q3)["input_rows"] == n_rows
    assert sum(out3) == n_users


def test_rate_limiter_share_of_divides_caps():
    """share_of=10 (ten concurrent partition copies) must divide both caps
    so the FLEET stays within the reference limit: each copy admits 20/s
    and 200/2min."""
    from aram_matchdata_etl_spark.sources.riot_datasource import (
        FakeTransport,
        RateLimitedTransport,
    )

    clk = FakeClock()
    t = RateLimitedTransport(
        inner=FakeTransport(), clock=clk.clock, sleep=clk.sleep, share_of=10
    )
    for _ in range(20):
        t._acquire()
    assert clk.t == 0.0
    t._acquire()  # 21st: burst share (200/10) exhausted
    assert clk.t == pytest.approx(1.0, abs=1e-3)
    for _ in range(179):
        t._acquire()
    t._acquire()  # 201st: window share (2000/10) exhausted
    assert clk.t == pytest.approx(120.0, abs=1e-2)
