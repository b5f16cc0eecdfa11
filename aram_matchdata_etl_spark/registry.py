"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle.

Operator modules register themselves at import time via the ``@query``
decorator; ``all_queries()`` / ``all_oracles()`` are what
``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

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
        functions_ext,
        match_pipeline,
        multimodal,
        relational,
        relational_ext,
        similarity,
        streaming_batch,
        text,
        tpch,
        training,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return dict(_ORACLES)
