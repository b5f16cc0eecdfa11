"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle.

Operator modules register themselves at import time via the ``@query``
decorator; ``all_queries()`` / ``all_oracles()`` are what
``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB-equivalent ANSI SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_operator_modules() -> None:
    # Import for registration side effects.
    from .operators import (  # noqa: F401
        advanced,
        asof,
        dedup,
        dq,
        events_analytics,
        functions_ext,
        graph,
        layout,
        linkage,
        market,
        match_pipeline,
        mlkit,
        multimodal,
        privacy,
        relational,
        relational_ext,
        similarity,
        stats,
        streaming_batch,
        text,
        tpch,
        training,
        web,
    )


def _sampled_rounds() -> dict[str, tuple[int, bool, bool]]:
    """Map query key -> (latest sampled round, latest verdict was red,
    latest sample ran without an oracle).

    The driver verifies only the first 50 keys of ``queries()`` per round,
    so ordering matters: a key whose most recent driver verdict was a FAIL
    must be re-sampled immediately (else a shipped fix stays unverifiable
    for several rounds), keys never checked come next so the 50-key window
    rotates across the whole surface, and green keys recycle least-recent
    first.
    """
    latest: dict[str, tuple[int, bool, bool]] = {}
    root = Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            prev = latest.get(key)
            if prev is not None and prev[0] > rnd:
                continue
            red = isinstance(row, dict) and (
                any(
                    row.get(f) is False
                    for f in ("rows_match", "schema_match", "hash_match")
                )
                # A crashed comparison (e.g. r4's unhashable-list canonicalizer
                # error) is just as red as a hash mismatch; 'no_oracle' is the
                # intentional rows-only path, not a failure.
                or bool(row.get("err")) and row.get("err") != "no_oracle"
            )
            rows_only = isinstance(row, dict) and row.get("err") == "no_oracle"
            latest[key] = (rnd, red, rows_only)
    return latest


# Among never-sampled keys, surface the highest-value families first so the
# driver's window covers them soonest (TPC-H adaptations, the training-data
# prep family, then similarity/text/streaming twins; misc extensions last).
_MODULE_PRIORITY = {
    "tpch": 0,
    "training": 1,
    "similarity": 2,
    "text": 3,
    "streaming_batch": 4,
}


# Keys whose RESULT SEMANTICS changed after their last green sample (a
# bug fix that moved the numbers in both dialects at once): promote into
# the next driver window so the fix gets a fresh driver verdict instead
# of waiting out a full green rotation. Remove entries once re-sampled.
_SEMANTICS_CHANGED: set[str] = set()
# (q_groupby_salted / q_interarrival_burstiness held slots here after
# their r9 exact-integer reformulations; removed once CORRECTNESS_r09
# re-sampled both green, per the contract. q_chi_squared likewise after
# CORRECTNESS_r08.)


def _rotated(keys: list[str]) -> list[str]:
    """Previously-FAILED keys first (their fixes must be re-verified in the
    very next round), then never-driver-sampled keys, keys that GAINED
    an oracle since their last rows-only sample (their upgrade to a
    hash-checked verdict should not wait a full rotation), and keys whose
    result semantics changed since their last green sample, then
    least-recently sampled; module family then registration order break
    ties (stable sort)."""
    latest = _sampled_rounds()

    def rank(k: str) -> tuple[int, int, int]:
        mod = _QUERIES[k].__module__.rsplit(".", 1)[-1]
        rnd, red, rows_only = latest.get(k, (-1, False, False))
        upgraded = rows_only and k in _ORACLES
        promoted = rnd < 0 or upgraded or k in _SEMANTICS_CHANGED
        bucket = 0 if red else (1 if promoted else 2)
        # upgraded / semantics-changed keys carry NEW oracle claims —
        # they must reach the next 50-key window even while the
        # never-sampled backlog (rnd == -1) exceeds one window, so they
        # sort ahead of it (there are only ever a handful per round)
        if bucket == 1 and (upgraded or k in _SEMANTICS_CHANGED):
            rnd = -2
        return bucket, rnd, _MODULE_PRIORITY.get(mod, 99)

    return sorted(keys, key=rank)


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {k: _QUERIES[k] for k in _rotated(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {k: _ORACLES[k] for k in _rotated(list(_QUERIES)) if k in _ORACLES}
