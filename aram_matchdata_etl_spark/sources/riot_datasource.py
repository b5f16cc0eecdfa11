"""Custom PySpark DataSource for the match-crawl API — the reference's
REST extractor (S3-S6, /root/reference/extractor/riot/match/api.py:7-122,
extractor/riot/tasks.py:61-164) surfaced as a first-class Spark source:

    spark.dataSource.register(RiotMatchDataSource)
    spark.read.format("riot_matches").option("n_users", 50).load()
    spark.readStream.format("riot_matches")
         .option("users_per_batch", 20).load()

Batch reads partition the user-id space across executors (one
InputPartition per slice — the fan-out the reference got from asyncio
batches of 200, tasks.py:70-90). The streaming reader tracks a durable
cursor offset over the user space, advancing at most ``users_per_batch``
users per micro-batch — the 2,000-ids-per-2-minute throughput ceiling
(tasks.py:18,45) expressed as offset-range admission control, replayable
from the checkpoint like any Spark source (the fake fetch is a pure
function of the key, so replay is deterministic by construction; a live
HTTP client would sit in exactly the same ``read`` method, one client per
partition).

Rows come out flat and typed (match/user keys + the raw JSON payloads);
downstream parses payloads with from_json against the explicit bronze
schema (SURVEY §1.3) — see operators/crawl-based queries in
streaming/crawl.py and sources/crawl_api.py.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .crawl_api import fake_match_detail, fake_match_ids, fake_match_timeline

SCHEMA = (
    "user_id bigint, match_id string, game_mode string, "
    "game_duration bigint, detail_json string, timeline_json string"
)

DEFAULT_N_USERS = 20
DEFAULT_USERS_PER_BATCH = 10
DEFAULT_SLICE = 8  # users per input partition (per-task fetch batch)


class Transport:
    """The HTTP seam: one instance per input-partition read, mirroring the
    reference's API wrapper surface (get_matches / get_match_detail /
    get_match_timeline, extractor/riot/match/api.py:7-122). A live
    implementation holds an httpx client and honors the 2,000-req/2-min cap
    (tasks.py:18-19) — the cap's admission control already lives in the
    stream reader's offset ranges, so a transport only needs per-request
    pacing/retries. Implementations must be picklable (constructed on the
    driver, shipped to executors inside the reader)."""

    def match_ids(self, user_id: int) -> Sequence[str]:
        raise NotImplementedError

    def match_detail(self, match_id: str) -> dict:
        raise NotImplementedError

    def match_timeline(self, match_id: str) -> dict:
        raise NotImplementedError


class FakeTransport(Transport):
    """Deterministic stand-in (pure function of the key): replay-safe by
    construction, so checkpoint recovery tests are exact."""

    def match_ids(self, user_id: int) -> Sequence[str]:
        return fake_match_ids(user_id)

    def match_detail(self, match_id: str) -> dict:
        return fake_match_detail(match_id)

    def match_timeline(self, match_id: str) -> dict:
        return fake_match_timeline(match_id)


class RateLimitedTransport(Transport):
    """Reference ``Transport`` implementation with the reference's pacing
    (extractor/riot/tasks.py:18-19): a sliding 2-minute window admitting at
    most 2,000 requests (MAX_REQUESTS_PER_2MIN), and at most 200 requests
    per 1-second burst (BATCH_SIZE — the reference's asyncio concurrency
    batch; in a serial partition read the equivalent cap is admissions per
    wall-second). Delegates the actual fetch to an inner transport
    (FakeTransport by default; a live HTTP transport slots in the same way).

    The clock is INJECTED (``clock()`` -> seconds, ``sleep(dt)``) so the
    admission-control math is unit-testable without wall-clock waits —
    tests drive a fake clock and assert exactly when request N is admitted.
    Defaults to time.monotonic/time.sleep for live use.

    IMPORTANT — the limiter state is PER INSTANCE, and Spark pickles one
    transport copy into EACH parallel partition reader — and RE-CREATES
    readers (and their transports) for every partition task, every
    micro-batch trigger, and every task retry, each starting with an empty
    window. Two mechanisms keep the FLEET within the reference caps
    despite that:

    - ``share_of=N`` (N = concurrent partition readers — e.g.
      ceil(n_users/slice) for a batch read) divides both caps across the
      N concurrent copies; the ``transport_workers`` datasource option
      wires this through the string-only option map.
    - steady-state pacing (``amortized=True``, the default): an instance
      may burst at most its 1-second cap (caps/N * 200/2000) up front,
      then admits at the AMORTIZED rate caps/N / WINDOW_S — so a fresh
      copy per trigger/retry cannot re-admit a full 2-minute quota; k
      re-instantiations within one window overshoot by at most k bursts
      (k * 200/N requests), not k * 2000/N. Exact cross-process
      enforcement would need shared state (the reference is a single
      asyncio process and has no such seam); pass ``amortized=False`` to
      get the reference's literal single-process window semantics.

    Why pacing lives here AND offset ranges live in the stream reader: the
    reader's ``users_per_batch`` bounds work per micro-batch (coarse,
    checkpoint-replayable), while the transport bounds the instantaneous
    request rate within a partition read (fine, protects the upstream API
    even when one user fans out to many match fetches)."""

    WINDOW_S = 120.0
    MAX_PER_WINDOW = 2000  # tasks.py:18 MAX_REQUESTS_PER_2MIN
    BURST_S = 1.0
    MAX_PER_BURST = 200  # tasks.py:19 BATCH_SIZE

    def __init__(
        self,
        inner: Transport | None = None,
        clock=None,
        sleep=None,
        share_of: int = 1,
        amortized: bool = True,
    ):
        import time as _time
        from collections import deque

        self.inner = inner if inner is not None else FakeTransport()
        self._clock = clock if clock is not None else _time.monotonic
        self._sleep = sleep if sleep is not None else _time.sleep
        self._window: deque[float] = deque()  # admission times, last 2 min
        self._burst: deque[float] = deque()  # admission times, last 1 s
        self.admitted = 0  # total requests admitted (telemetry)
        self.waited_s = 0.0  # total time spent blocked (telemetry)
        self._amortized = amortized
        # birth time is set at FIRST acquire, not construction: the
        # instance is pickled driver-side and unpickled on an executor
        # whose monotonic clock is unrelated to the driver's
        self._t0: float | None = None
        self.set_share(share_of)

    def set_share(self, share_of: int) -> None:
        """Divide both caps across ``share_of`` concurrent limiter copies
        (floor, min 1) so the fleet-wide rate stays within the reference
        caps when Spark fans the transport out to parallel partitions."""
        if share_of < 1:
            raise ValueError(f"share_of must be >= 1, got {share_of}")
        self._max_per_window = max(1, self.MAX_PER_WINDOW // share_of)
        self._max_per_burst = max(1, self.MAX_PER_BURST // share_of)
        # steady-state admission rate for amortized pacing
        self._rate = self._max_per_window / self.WINDOW_S

    def _evict(self, now: float) -> None:
        while self._window and self._window[0] <= now - self.WINDOW_S:
            self._window.popleft()
        while self._burst and self._burst[0] <= now - self.BURST_S:
            self._burst.popleft()

    def _acquire(self) -> None:
        """Block until both caps admit one request, then record it."""
        while True:
            now = self._clock()
            self._evict(now)
            waits = []
            if len(self._window) >= self._max_per_window:
                waits.append(self._window[0] + self.WINDOW_S - now)
            if len(self._burst) >= self._max_per_burst:
                waits.append(self._burst[0] + self.BURST_S - now)
            if self._amortized:
                # token bucket: capacity = the 1-s burst cap, refill at the
                # window's amortized rate — bounds what a freshly-created
                # copy (new task / trigger / retry) can admit to
                # burst + rate * age, instead of a full window quota
                if self._t0 is None:
                    self._t0 = now
                target = (
                    self._t0
                    + (self.admitted + 1 - self._max_per_burst) / self._rate
                )
                if target > now:
                    waits.append(target - now)
            if not waits:
                self._window.append(now)
                self._burst.append(now)
                self.admitted += 1
                return
            dt = max(max(waits), 1e-4)
            self.waited_s += dt
            self._sleep(dt)

    def match_ids(self, user_id: int) -> Sequence[str]:
        self._acquire()
        return self.inner.match_ids(user_id)

    def match_detail(self, match_id: str) -> dict:
        self._acquire()
        return self.inner.match_detail(match_id)

    def match_timeline(self, match_id: str) -> dict:
        self._acquire()
        return self.inner.match_timeline(match_id)


class RateLimitedFakeTransport(RateLimitedTransport):
    """Zero-arg constructible form for the string-only ``transport`` option
    (``'aram_matchdata_etl_spark.sources.riot_datasource:RateLimitedFakeTransport'``):
    rate-limited pacing over the deterministic fake fetch."""


def _load_transport(options) -> Transport:
    """Resolve the ``transport`` option ('pkg.module:ClassName') to an
    instance; default FakeTransport. A dotted path (not a live object)
    keeps the option serializable through Spark's string-only option map
    and importable on executors. ``transport_workers`` (int) divides a
    rate-limited transport's caps across that many concurrent partition
    copies — see RateLimitedTransport.set_share."""
    spec = options.get("transport")
    if not spec:
        return FakeTransport()
    import importlib

    mod_name, _, cls_name = spec.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    transport = cls()
    if not isinstance(transport, Transport):
        raise TypeError(f"{spec} is not a Transport")
    workers = options.get("transport_workers")
    if workers and isinstance(transport, RateLimitedTransport):
        transport.set_share(int(workers))
    return transport


def _rows_for_users(users: Sequence[int], transport: Transport) -> Iterator[tuple]:
    """Pure fetch: user page -> match ids -> detail + timeline (dedup of
    match ids repeated across users happens downstream, like the Redis
    SET did — the source reports what the API returned)."""
    for u in users:
        for mid in transport.match_ids(u):
            detail = transport.match_detail(mid)
            timeline = transport.match_timeline(mid)
            yield (
                u,
                mid,
                detail["info"]["gameMode"],
                detail["info"]["gameDuration"],
                json.dumps(detail, sort_keys=True),
                json.dumps(timeline, sort_keys=True),
            )


class _UserSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RiotBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_users = int(options.get("n_users", DEFAULT_N_USERS))
        self.slice = int(options.get("slice", DEFAULT_SLICE))
        self.transport = _load_transport(options)

    def partitions(self):
        return [
            _UserSlice(lo, min(lo + self.slice, self.n_users))
            for lo in range(0, self.n_users, self.slice)
        ]

    def read(self, partition: _UserSlice):
        return _rows_for_users(range(partition.start, partition.end), self.transport)


class RiotStreamReader(DataSourceStreamReader):
    """Offset = how far through the user-id space the crawl has advanced.
    latestOffset() admits at most users_per_batch new users per trigger
    (T2 rate limiting); partitions() re-slices any [start, end) range, so
    checkpoint replay of an old range yields identical rows."""

    def __init__(self, options):
        self.n_users = int(options.get("n_users", DEFAULT_N_USERS))
        self.per_batch = int(options.get("users_per_batch", DEFAULT_USERS_PER_BATCH))
        self.slice = int(options.get("slice", DEFAULT_SLICE))
        self.transport = _load_transport(options)
        self._cursor = 0

    def initialOffset(self):
        return {"user": 0}

    def latestOffset(self):
        self._cursor = min(self._cursor + self.per_batch, self.n_users)
        return {"user": self._cursor}

    def partitions(self, start, end):
        # Restart recovery: after a checkpoint restore the engine plans
        # batches from its committed offsets while self._cursor restarted
        # at 0 — clamp it forward so latestOffset() stays monotone and
        # never re-admits offset ranges that were already committed
        # (duplicate rows at a non-idempotent sink otherwise).
        self._cursor = max(self._cursor, end["user"])
        lo, hi = start["user"], end["user"]
        return [
            _UserSlice(a, min(a + self.slice, hi)) for a in range(lo, hi, self.slice)
        ]

    def read(self, partition: _UserSlice):
        return _rows_for_users(range(partition.start, partition.end), self.transport)

    def commit(self, end):
        # Same clamp on the commit path: commit(end) can arrive for a
        # batch planned before this reader instance existed.
        self._cursor = max(self._cursor, end["user"])


class RiotMatchDataSource(DataSource):
    @classmethod
    def name(cls):
        return "riot_matches"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return RiotBatchReader(self.options)

    def streamReader(self, schema):
        return RiotStreamReader(self.options)
