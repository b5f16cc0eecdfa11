"""spark_round (operators/oracle_helpers.py) must reproduce Spark's
ROUND(double, n) EXACTLY in DuckDB — it guards the whole ROUND-boundary
divergence class the r9 cross-scale sweeps surfaced, so it gets its own
property test instead of being trusted from the two shipped data points.
"""

from __future__ import annotations

import duckdb
import numpy as np

from pyspark.sql import functions as F

from aram_matchdata_etl_spark.operators.oracle_helpers import spark_round

# the two shipped regressions + hand-built boundary shapes
KNOWN_BOUNDARY_CASES = [
    (26.241249999999997, 4),  # q_tpch_q2: duck FP-round UP, spark DOWN
    (33374.0610425, 6),  # q_interarrival_burstiness: duck DOWN, spark UP
    (0.5, 0),
    (-0.5, 0),
    (2.675, 2),  # classic: binary value is 2.67499999...
    (-2.675, 2),
    (1e-7, 6),
    (-1e-7, 6),
    (0.0, 3),
    (123456789.987654321, 6),
]

# outside the DECIMAL(38,18) domain: the helper's guard must fall back
# to plain ROUND instead of erroring in the VARCHAR->DECIMAL cast
NON_DECIMAL_DOMAIN_CASES = [
    (float("nan"), 2),
    (float("inf"), 2),
    (float("-inf"), 4),
    (1e21, 2),
    (-3.7e25, 0),
    (1.797e308, 6),
]


def _duck_round(con, x, n):
    sql = spark_round("?::DOUBLE", n)
    return con.execute(f"SELECT {sql}", [x] * sql.count("?")).fetchone()[0]


def _spark_rounds(spark, vals_scales):
    df = spark.createDataFrame(vals_scales, "x double, n int")
    out = []
    for n in sorted({n for _, n in vals_scales}):
        rows = (
            df.filter(F.col("n") == n)
            .select(F.col("x"), F.round(F.col("x"), n).alias("r"))
            .collect()
        )
        out.extend((r.x, n, r.r) for r in rows)
    return out


def test_spark_round_matches_spark_on_boundaries_and_random(spark):
    rng = np.random.default_rng(20260815)
    cases = list(KNOWN_BOUNDARY_CASES)
    # random magnitudes spanning the scales oracles round at, plus
    # values CONSTRUCTED to sit near grid boundaries at each scale
    for n in (0, 2, 4, 6):
        cases.extend(
            (float(v), n)
            for v in rng.uniform(-1e6, 1e6, size=50) * 10.0 ** rng.integers(-3, 4, 50)
        )
        grid = rng.integers(-10**8, 10**8, size=50)
        jitter = rng.uniform(-2e-12, 2e-12, size=50)
        cases.extend(
            (float((g + 0.5) * 10.0**-n * (1 + j)), n)
            for g, j in zip(grid, jitter)
        )

    cases.extend(NON_DECIMAL_DOMAIN_CASES)

    got_spark = _spark_rounds(spark, cases)
    con = duckdb.connect()
    mismatches = []
    for x, n, r_spark in got_spark:
        r_duck = _duck_round(con, x, n)
        # compare as doubles, bit-meaningfully: repr equality catches
        # -0.0 vs 0.0 too (Spark's BigDecimal round never emits -0.0,
        # and the helper's DECIMAL path doesn't either)
        if repr(r_duck) != repr(r_spark):
            mismatches.append((x, n, r_spark, r_duck))
    assert not mismatches, mismatches[:10]


def test_plain_duckdb_round_actually_differs_on_the_shipped_cases():
    """Meta-check: the helper is not vacuous — plain ROUND really does
    disagree with Spark on the shipped regression values (if DuckDB
    ever changes its ROUND to match, this flags the helper for
    retirement rather than silently keeping dead complexity)."""
    con = duckdb.connect()
    plain = [
        con.execute(f"SELECT ROUND(?::DOUBLE, {n})", [x]).fetchone()[0]
        for x, n in KNOWN_BOUNDARY_CASES[:2]
    ]
    helper = [_duck_round(con, x, n) for x, n in KNOWN_BOUNDARY_CASES[:2]]
    assert plain != helper, (
        "DuckDB's plain ROUND now matches the Spark-emulating helper on "
        "the shipped boundary cases — re-evaluate whether spark_round "
        "is still needed"
    )
