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
    as the batch operator (xxhash64(word, seed) mod width), grouped into
    (seed, block) keys for the stateful update."""
    from ..operators.streaming_batch import CM_DEPTH, CM_WIDTH

    seeds = F.array(*[F.lit(i) for i in range(CM_DEPTH)])
    cells = words_stream.select(
        F.explode(seeds).alias("seed"),
        F.pmod(F.xxhash64("word", F.col("seed")), F.lit(CM_WIDTH)).alias("cell"),
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
                        "zscore": np.where(ok, np.round(z, 4), np.nan),
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
