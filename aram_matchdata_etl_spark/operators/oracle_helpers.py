"""Shared DuckDB-oracle SQL fragments.

``spark_round``: emulate Spark's ROUND(double, n) exactly. The two
engines disagree on rounding-boundary doubles in BOTH directions:

- Spark's Round expression rounds the BigDecimal of the double's
  SHORTEST decimal representation (Double.toString) with HALF_UP —
  so 33374.0610425 (true binary value ...42499999...) rounds UP.
- DuckDB's ROUND(DOUBLE, n) works on the double itself (x * 10^n
  then nearest), so the same value rounds DOWN — while a value like
  26.241249999999997 (whose x * 10^4 lands exactly ON .5 in FP)
  rounds UP where Spark's string path rounds DOWN.

Casting through VARCHAR gives DuckDB the shortest-roundtrip string;
parsing it as DECIMAL(38,18) is exact for every shortest double repr
(<= 17 significant digits), and DECIMAL ROUND is HALF_UP — i.e.
Spark's algorithm. Identical to plain ROUND for every non-boundary
value, so swapping it into a green oracle cannot change its hash on
fixtures that never hit a boundary.

Found by the r9 full-registry parity sweeps at sf0.001/sf0.1 (the
driver gate runs only sf0.01): q_tpch_q2 and
q_interarrival_burstiness each lost one row to this class at one SF.
Use this helper for any oracle ROUND over a genuinely FP expression;
integer-derived expressions (counts, exact cent/microsecond sums)
cannot hit boundaries and may keep plain ROUND.
"""

from __future__ import annotations


def spark_round(expr: str, n: int) -> str:
    """DuckDB SQL reproducing Spark's ROUND(``expr``, ``n``) bit-for-bit
    (see module docstring). NULL-safe: every step propagates NULL.

    Domain: the DECIMAL(38, 18) path is exact only for finite doubles
    with |x| < 1e20 (20 integer digits); NaN/Inf and larger magnitudes
    would error in the VARCHAR->DECIMAL cast, so those fall through to
    a passthrough of the raw value — which IS Spark's answer there:
    ROUND(NaN/Inf, n) is NaN/Inf, and at |x| >= 1e20 the double grid
    spacing exceeds 1 so ROUND(x, n >= 0) is the identity. (DuckDB's
    own ROUND is NOT safe as the fallback: its x*10^n FP path drops a
    ulp on e.g. ROUND(1e21, 2).) Requires n >= 0.
    """
    if n < 0:
        raise ValueError("spark_round fallback assumes n >= 0")
    guard = f"isfinite(({expr})) AND abs(({expr})) < 1e20"
    exact = (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38, 18)), {n})"
        " AS DOUBLE)"
    )
    return f"CASE WHEN {guard} THEN {exact} ELSE ({expr}) END"
