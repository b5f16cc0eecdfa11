"""Custom stateful streaming operator via applyInPandasWithState:
a per-user crawl-budget counter — the stateful piece of the reference's
rate limiting (tasks.py:18-52 caps ids-per-run; the Redis SET is the
state). Each user's state is (events_seen, budget_left); events beyond the
budget are flagged throttled instead of dropped, mirroring the
skip-and-requeue behavior.

Scale: state is partitioned by key in the state store (RocksDB on a real
cluster) and each micro-batch touches only the keys present in the batch —
the same access pattern as the reference's per-key Redis ops, but
distributed and checkpointed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_id long, seen_before long, throttled boolean"
STATE_SCHEMA = "seen long"
DEFAULT_BUDGET = 5


def budget_tracker(budget: int = DEFAULT_BUDGET):
    """Returns the applyInPandasWithState function: counts events per user
    across micro-batches; events past `budget` are flagged."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seen = state.get[0] if state.exists else 0
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # vectorized: each row's ordinal is the carried count plus its
            # position within the (sorted) batch — no per-row Python loop
            seen_before = seen + np.arange(len(pdf), dtype=np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(len(pdf), int(user_id), dtype=np.int64),
                        "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                        "seen_before": seen_before,
                        "throttled": seen_before >= budget,
                    }
                )
            )
            seen += len(pdf)
        state.update((seen,))
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                columns=["user_id", "event_id", "seen_before", "throttled"]
            )
        )
        yield out

    return fn


def track_budgets(stream: DataFrame, budget: int = DEFAULT_BUDGET) -> DataFrame:
    """Apply the stateful budget counter to a stream keyed by user_id."""
    return stream.groupBy("user_id").applyInPandasWithState(
        budget_tracker(budget),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming count-min sketch (mergeable sketch state across triggers) ----

CM_BLOCK_W = 128  # cells per state key; CM_WIDTH/CM_BLOCK_W keys per seed


def cm_updater():
    """applyInPandasWithState function maintaining one BLOCK of the
    count-min grid per group key (seed, block): state is the block's cell
    array; each micro-batch bincounts its rows into the block
    (vectorized, no per-row Python) and emits the running block with a
    monotone `version` (total increments so far) so a consumer — or the
    parity test — can pick each key's latest emission.

    This is the streaming twin of operators/streaming_batch.py::
    countmin_sketch (VERDICT/ROADMAP: the mergeable-sketch property IS
    the streaming story — cells merge by addition, so per-trigger updates
    and cross-partition merges are the same operation). Keying by
    (seed, block) rather than seed alone keeps the state store's
    parallelism at depth x (width/block) keys instead of depth."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seed, block = int(key[0]), int(key[1])
        cells = (
            np.array(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(CM_BLOCK_W, dtype=np.int64)
        )
        for pdf in pdfs:
            local = pdf["cell"].to_numpy(dtype=np.int64) - block * CM_BLOCK_W
            cells += np.bincount(local, minlength=CM_BLOCK_W)
        state.update((cells.tolist(),))
        yield pd.DataFrame(
            {
                "seed": [seed],
                "block": [block],
                "version": [int(cells.sum())],
                "cells": [cells.tolist()],
            }
        )

    return fn


def streaming_countmin(words_stream: DataFrame) -> DataFrame:
    """Count-min grid over a streaming `word` column: same cell assignment
    as the batch operator (shared md5-prefix bucket via _cm_cell — the
    streaming and batch sketches must stay cell-compatible so they merge),
    grouped into (seed, block) keys for the stateful update."""
    from ..operators.streaming_batch import CM_DEPTH, _cm_cell

    seeds = F.array(*[F.lit(i) for i in range(CM_DEPTH)])
    cells = words_stream.select(
        F.col("word"), F.explode(seeds).alias("seed")
    ).select(
        "seed", _cm_cell(F.col("word"), F.col("seed")).alias("cell")
    ).withColumn("block", (F.col("cell") / CM_BLOCK_W).cast("int"))
    return cells.groupBy("seed", "block").applyInPandasWithState(
        cm_updater(),
        outputStructType="seed int, block int, version long, cells array<long>",
        stateStructType="cells array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming rolling z-score (the anomaly operator's stream twin) --------


def zscore_tracker(lookback: int | None = None, threshold: float | None = None):
    """applyInPandasWithState function for per-user rolling z-score: state
    is the user's trailing ``lookback`` values (a bounded tail — the only
    state the ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING frame ever
    needs, so the state store stays O(keys * lookback) forever). Batch
    rows are scored vectorized via pandas rolling over (carried tail ++
    batch), then the tail is re-trimmed — no per-row Python.

    Semantics mirror operators/events_analytics.py::anomaly_zscore
    exactly: baseline excludes the current value (shift(1)), sigma is the
    sample stddev (ddof=1 == Spark stddev), <2 prior values or a flat
    baseline -> NULL zscore and never flagged."""
    from ..operators.events_analytics import ZSCORE_LOOKBACK, ZSCORE_THRESHOLD

    lb = lookback or ZSCORE_LOOKBACK
    th = threshold or ZSCORE_THRESHOLD

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        tail = list(state.get[0]) if state.exists else []
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            vals = pdf["value"].to_numpy(dtype=np.float64)
            combined = pd.Series(np.concatenate([np.asarray(tail, np.float64), vals]))
            prev = combined.shift(1)
            mu = prev.rolling(window=lb, min_periods=2).mean()
            sd = prev.rolling(window=lb, min_periods=2).std()  # ddof=1
            z = ((combined - mu) / sd).to_numpy()[len(tail):]
            sd_b = sd.to_numpy()[len(tail):]
            ok = np.isfinite(z) & (sd_b > 0)
            frames.append(
                pd.DataFrame(
                    {
                        "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                        "user_id": np.full(len(pdf), int(user_id), dtype=np.int64),
                        # HALF_UP to match the batch operator's F.round
                        # bit-for-bit (np.round is half-to-even, which
                        # drifts in the 4th decimal on ties — ADVICE r5)
                        "zscore": np.where(
                            ok,
                            np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4,
                            np.nan,
                        ),
                        "is_anomaly": ok & (np.abs(z) > th),
                    }
                )
            )
            tail = combined.tolist()[-lb:]
        state.update((tail,))
        yield (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=["event_id", "user_id", "zscore", "is_anomaly"])
        )

    return fn


def streaming_zscore(stream: DataFrame) -> DataFrame:
    """Per-user rolling z-score over an events stream — the stateful
    streaming twin of q_anomaly_zscore."""
    return stream.groupBy("user_id").applyInPandasWithState(
        zscore_tracker(),
        outputStructType="event_id long, user_id long, zscore double, is_anomaly boolean",
        stateStructType="tail array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming conversion funnel (events_analytics.funnel's stream twin) ---

FUNNEL_STAGES_STREAM = ("view", "click", "purchase")

# Stored "unreached" sentinel for the funnel state struct (fields are long;
# None round-trips are avoided deliberately). Long.MIN_VALUE sits outside
# every real tick domain — a plain -1 would collide with pre-1970
# (negative-tick) event times and make those stages unanchorable
# (ADVICE r5).
_UNREACHED = -(2**63)


def funnel_tracker(stages: tuple[str, ...] = FUNNEL_STAGES_STREAM):
    """applyInPandasWithState function for the first-touch funnel: state
    is one epoch-micros timestamp per stage (O(stages) per user,
    forever). Stage k's timestamp is the earliest event of type
    ``stages[k]`` at-or-after the stage-(k-1) timestamp — identical to
    the batch window cascade PROVIDED each user's events arrive in
    event-time order across triggers (the file-source tests deliver
    time-sliced batches; a production topology gets this from a
    watermark + sorted state flush, or accepts first-touch drift).

    Batch update is vectorized: per stage, one boolean mask + min over
    the batch — no per-row Python.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n = len(stages)
        ts_state = (
            [v if v != _UNREACHED else None for v in state.get]
            if state.exists
            else [None] * n
        )
        for pdf in pdfs:
            et = pdf["event_type"].to_numpy()
            tsv = pdf["ts"].astype("int64").to_numpy()  # epoch ticks (us or ns per pandas dtype; unit-consistent across batches, which is all the cascade needs)
            # stage -1 anchor: no time constraint on stage 0 — Long.MIN,
            # not 0, so pre-1970 (negative-tick) events can still anchor
            prev: int | None = _UNREACHED
            for k, stage in enumerate(stages):
                if ts_state[k] is not None:
                    # monotone event time: an already-anchored stage can
                    # only have been anchored by an earlier-or-equal ts
                    prev = ts_state[k]
                    continue
                if prev is None:
                    break  # upstream stage unreached: nothing below fires
                mask = (et == stage) & (tsv >= prev)
                if mask.any():
                    ts_state[k] = int(tsv[mask].min())
                prev = ts_state[k]
        state.update(tuple(v if v is not None else _UNREACHED for v in ts_state))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                **{
                    f"t{k}": [float(ts_state[k]) if ts_state[k] is not None else np.nan]
                    for k in range(n)
                },
            }
        )

    return fn


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """First-touch funnel state per user over an events stream — the
    stateful streaming twin of operators/events_analytics.py::funnel.
    Emits each user's per-stage anchor timestamps (epoch ticks as
    double, NaN = unreached) every trigger; the latest emission per
    user is the live funnel, aggregable to stage counts at any time."""
    return stream.groupBy("user_id").applyInPandasWithState(
        funnel_tracker(),
        outputStructType="user_id long, t0 double, t1 double, t2 double",
        stateStructType="t0 long, t1 long, t2 long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming CDC latest-wins apply (lakehouse MERGE state across triggers) -

CDC_OUTPUT_SCHEMA = (
    "user_id long, last_op string, last_value double, n_changes long"
)
CDC_STATE_SCHEMA = "n long, ts_us long, eid long, op string, val double"


def cdc_tracker():
    """applyInPandasWithState function for streaming CDC apply: per-key
    state is (change count, latest (ts, event_id) watermark, latest op,
    latest value). Each micro-batch folds its rows into the state with
    latest-wins semantics and emits the key's CURRENT snapshot row — the
    streaming half of q_cdc_apply's batch collapse, and the state access
    pattern of a foreachBatch MERGE INTO against a lakehouse table
    (state here plays the target-table role; the count makes the emitted
    row depend on EVERY prior trigger, so cross-trigger state carriage
    is what the batch-parity gate actually proves)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, ts_us, eid, op, val = state.get
        else:
            n, ts_us, eid, op, val = 0, -(2**62), -(2**62), "", 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"])
            n += len(pdf)
            last = pdf.iloc[-1]
            cand = (int(last["ts_us"]), int(last["event_id"]))
            if cand > (ts_us, eid):
                ts_us, eid = cand
                op, val = str(last["op"]), float(last["value"])
        state.update((int(n), int(ts_us), int(eid), op, float(val)))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "last_op": [op],
                "last_value": [val],
                "n_changes": [int(n)],
            }
        )

    return fn


def apply_cdc(stream: DataFrame) -> DataFrame:
    """Apply the streaming CDC latest-wins tracker, keyed by user_id."""
    return stream.groupBy("user_id").applyInPandasWithState(
        cdc_tracker(),
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- event-time-timeout session closer ---------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, cnt long"


def session_closer(gap_s: int):
    """applyInPandasWithState function exercising EVENT-TIME TIMEOUTS —
    the one GroupStateTimeout mechanism the other stateful operators
    (NoTimeout) leave untested. Per key the state is the single open
    session (sessions are time-ordered, so at most one is open). A
    session closed by a LATER event of the same key (gap exceeded)
    emits immediately — that closure is final regardless of watermark.
    The key's trailing session instead registers an event-time timeout
    at last_event + gap: Spark invokes the function again WITHOUT data
    once the watermark passes that point (even if the key never appears
    in another batch), which is when the trailing session emits. What
    the driver gate proves: gap-splits, cross-trigger session
    continuation, AND watermark-driven timeout firing all behave
    exactly as the batch oracle's deterministic replay predicts."""

    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "start_us", "end_us", "n_events"]
        if state.hasTimedOut:
            start_us, last_us, cnt = state.get
            state.remove()
            yield pd.DataFrame(
                [[int(user_id), int(start_us), int(last_us), int(cnt)]],
                columns=cols,
            )
            return
        open_sess = state.get if state.exists else None
        closed: list[list[int]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"])
            ts = pdf["ts_us"].to_numpy(dtype=np.int64)
            # vectorized gap-split of the batch
            brk = np.nonzero(np.diff(ts) > gap_us)[0] + 1
            seg_starts = np.concatenate(([0], brk))
            seg_ends = np.concatenate((brk, [len(ts)]))
            for s, e in zip(seg_starts, seg_ends):
                seg = (int(ts[s]), int(ts[e - 1]), int(e - s))
                if open_sess is not None and seg[0] - open_sess[1] <= gap_us:
                    open_sess = (
                        int(open_sess[0]),
                        seg[1],
                        int(open_sess[2]) + seg[2],
                    )
                else:
                    if open_sess is not None:
                        closed.append(
                            [int(user_id), *[int(x) for x in open_sess]]
                        )
                    open_sess = seg
        if open_sess is not None:
            state.update(
                (int(open_sess[0]), int(open_sess[1]), int(open_sess[2]))
            )
            state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        yield pd.DataFrame(closed, columns=cols) if closed else pd.DataFrame(
            columns=cols
        )

    return fn


def close_sessions(stream: DataFrame, gap_s: int) -> DataFrame:
    """Apply the event-time-timeout sessionizer. The stream must carry a
    watermarked `ts` plus precomputed `ts_us`/`event_id` columns."""
    return stream.groupBy("user_id").applyInPandasWithState(
        session_closer(gap_s),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
