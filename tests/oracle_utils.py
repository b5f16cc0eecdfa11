"""Differential-test harness: run a registry query on Spark and its oracle
SQL on DuckDB over the same parquet fixtures, compare as multisets
(column-name-sorted, row-order-insensitive) — a local replica of the
driver's correctness gate."""

from __future__ import annotations

import math
from datetime import datetime
from typing import Any

import duckdb
import pandas as pd

from aram_matchdata_etl_spark.sources.tables import TABLES


def duckdb_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # NOTE: integral floats are deliberately NOT normalized to int.
        # The driver's canonicalizer hashes 123.0 != 123, so an oracle whose
        # integer SUM comes back as DuckDB HUGEINT (-> pandas float64) must
        # be fixed with an explicit CAST(... AS BIGINT), not papered over
        # here (r5's q_dq_violations/q_mad_outliers/q_domain_stats reds were
        # hidden locally by exactly such a normalization).
        return f"{v:.12g}"
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (bool,)):
        return bool(v)
    if isinstance(v, (int,)):
        return int(v)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def assert_driver_hashable(pdf: pd.DataFrame, name: str = "?") -> None:
    """Replicate the driver's constraint: its canonicalizer sort_values-es
    the result frame, and pandas cannot sort list/array-typed columns
    (``TypeError: unhashable type: 'list'`` — r4's only red row,
    q_array_funcs). Any oracled query whose output contains a list, tuple,
    or ndarray cell must fail LOCALLY so local-green always implies
    driver-green. Fix the operator by emitting array columns as joined
    strings (F.array_join / duckdb array_to_string) in BOTH dialects."""
    import numpy as np

    for col in pdf.columns:
        s = pdf[col].dropna()
        if len(s) == 0:
            continue
        v = s.iloc[0]
        if isinstance(v, (list, tuple, dict, set, np.ndarray)):
            raise AssertionError(
                f"{name}: column {col!r} is {type(v).__name__}-typed; the "
                "driver canonicalizer cannot sort it. Emit it as a joined "
                "string in both dialects."
            )


def assert_numeric_dtype_parity(
    got: pd.DataFrame, want: pd.DataFrame, name: str = "?"
) -> None:
    """Fail when one engine materializes a column as float while the other
    keeps it integral — the exact class of mismatch the driver's hash
    canonicalizer cannot absorb (DuckDB types an uncast integer SUM as
    HUGEINT, which pandas converts to float64, hashing ``123.0`` against
    Spark's ``123``). Forces an explicit ``CAST(... AS BIGINT)`` (or
    ``AS DOUBLE`` on the Spark side) in whichever dialect drifted."""
    for col in got.columns:
        if col not in want.columns:
            continue
        g_int = pd.api.types.is_integer_dtype(got[col])
        w_int = pd.api.types.is_integer_dtype(want[col])
        g_f = pd.api.types.is_float_dtype(got[col])
        w_f = pd.api.types.is_float_dtype(want[col])
        if (g_int and w_f) or (g_f and w_int):
            raise AssertionError(
                f"{name}: column {col!r} is "
                f"{'int' if g_int else 'float'} on Spark but "
                f"{'int' if w_int else 'float'} on DuckDB; the driver "
                "hashes 123.0 != 123. Add an explicit cast in the "
                "drifting dialect (CAST(... AS BIGINT) for HUGEINT sums)."
            )


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = duckdb_df(oracle, sf_dir)
    assert_driver_hashable(got, name)
    assert_driver_hashable(want, name)
    assert_numeric_dtype_parity(got, want, name)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} duck={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duck={len(want)}"
    g = normalize(got)
    w = normalize(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
