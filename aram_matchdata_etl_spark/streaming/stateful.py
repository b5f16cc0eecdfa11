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
