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
        match_pipeline,
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


def _sampled_rounds() -> dict[str, int]:
    """Map query key -> latest round number in which the driver's
    ``CORRECTNESS_r{N}.json`` recorded a row for it.

    The driver verifies only the first 50 keys of ``queries()`` per round,
    so ordering matters: keys it has never checked should come first so
    the 50-key window rotates across the whole surface round over round.
    """
    latest: dict[str, int] = {}
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
        for key in rows:
            latest[key] = max(rnd, latest.get(key, 0))
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


def _rotated(keys: list[str]) -> list[str]:
    """Never-driver-sampled keys first (ranked by module family), then
    least-recently sampled; registration order breaks ties (stable sort)."""
    latest = _sampled_rounds()

    def rank(k: str) -> tuple[int, int]:
        mod = _QUERIES[k].__module__.rsplit(".", 1)[-1]
        return latest.get(k, -1), _MODULE_PRIORITY.get(mod, 99)

    return sorted(keys, key=rank)


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {k: _QUERIES[k] for k in _rotated(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {k: _ORACLES[k] for k in _rotated(list(_QUERIES)) if k in _ORACLES}
