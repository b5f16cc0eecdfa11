"""The registration-time ROUND rewriter (registry.sparkify_round) closes
the whole Spark-vs-DuckDB ROUND-boundary class the r9 cross-scale sweeps
surfaced: every plain ROUND(expr[, n]) in every registered oracle is
rewritten to the Spark-exact spark_round form before DuckDB ever sees it.
These tests pin the rewriter's parsing (nesting, quoting, one-arg form,
already-converted sites) and gate the FULL registry: zero unrewritten
sites may remain in all_oracles().
"""

from __future__ import annotations

import re

import duckdb
import pytest

from aram_matchdata_etl_spark.registry import (
    _GENERATED_PREFIX,
    _first_plain_round,
    _masked,
    all_oracles,
    sparkify_round,
)
from aram_matchdata_etl_spark.operators.oracle_helpers import spark_round


def _plain_round_sites(sql: str) -> list[int]:
    masked = _masked(sql)
    out, pos = [], 0
    while True:
        i = _first_plain_round(masked, pos)
        if i is None:
            return out
        out.append(i)
        pos = masked.index("(", i) + 1


def test_simple_site_rewrites_to_spark_round():
    assert sparkify_round("SELECT ROUND(x, 2) AS r FROM t") == (
        f"SELECT {spark_round('x', 2)} AS r FROM t"
    )


def test_one_arg_form_uses_scale_zero():
    assert sparkify_round("SELECT ROUND(x * 100) FROM t") == (
        f"SELECT {spark_round('x * 100', 0)} FROM t"
    )


def test_nested_rounds_rewrite_innermost_first():
    out = sparkify_round("SELECT ROUND(a + ROUND(b, 4), 2) FROM t")
    assert not _plain_round_sites(out)
    # the inner site was converted BEFORE the outer quadruplicated it:
    # the generated inner text appears inside each outer copy
    inner = spark_round("b", 4)
    assert out == f"SELECT {spark_round(f'a + {inner}', 2)} FROM t"


def test_quoted_round_text_is_left_alone():
    sql = "SELECT 'use ROUND(x, 2) wisely' AS note, ROUND(y, 3) FROM t"
    out = sparkify_round(sql)
    assert "'use ROUND(x, 2) wisely'" in out
    assert not _plain_round_sites(out)


def test_commas_and_parens_inside_quoted_args_parse():
    sql = "SELECT ROUND(strpos(s, '((,'') ROUND(') + 0.5, 0) FROM t"
    out = sparkify_round(sql)
    assert not _plain_round_sites(out)
    assert "'((,'') ROUND('" in out


def test_already_converted_sites_are_not_double_wrapped():
    once = sparkify_round("SELECT ROUND(x, 2) FROM t")
    assert sparkify_round(once) == once


def test_non_literal_scale_raises():
    with pytest.raises(ValueError, match="non-literal"):
        sparkify_round("SELECT ROUND(x, n) FROM t")


def test_identifier_containing_round_is_not_a_site():
    sql = "SELECT workaround(x), aROUND(y), background FROM t"
    assert sparkify_round(sql) == sql


def test_rewritten_sql_runs_and_matches_plain_round_off_boundary():
    con = duckdb.connect()
    sql = "SELECT ROUND(SUM(v) / COUNT(*), 3) AS m FROM (VALUES (1.25), (2.5), (4.125)) AS t(v)"
    plain = con.sql(sql).fetchone()[0]
    conv = con.sql(sparkify_round(sql)).fetchone()[0]
    assert conv == plain == 2.625


def test_full_registry_has_zero_plain_round_sites():
    """The gate: no registered oracle ships a plain ROUND to DuckDB, so
    the r9 divergence class cannot recur through a new oracle either."""
    bad = {
        name: len(sites)
        for name, sql in all_oracles().items()
        if (sites := _plain_round_sites(sql))
    }
    assert not bad, f"unrewritten ROUND sites: {bad}"
    # and the generated form is actually present (the rewrite is live,
    # not vacuously green because ROUND vanished from the oracles)
    n_generated = sum(
        sql.count(_GENERATED_PREFIX) for sql in all_oracles().values()
    )
    assert n_generated > 400, n_generated


def test_registry_oracles_still_parse_in_duckdb():
    """Every rewritten oracle must still be syntactically valid: PREPARE
    against empty views catches paren/type damage registry-wide without
    paying a full parity run here (test_oracle_parity does values)."""
    from aram_matchdata_etl_spark.sources.tables import TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet' LIMIT 0")
    errors = {}
    for name, sql in all_oracles().items():
        try:
            con.sql(sql)  # LIMIT-0 views: plans + types, near-zero rows
        except Exception as e:  # noqa: BLE001 - collecting all failures
            errors[name] = str(e).splitlines()[0][:120]
    assert not errors, errors
