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


# ---------------------------------------------------------------------------
# ROUND-boundary hardening (r10, closing the class scoped in r9): Spark's
# ROUND(double, n) rounds the double's SHORTEST DECIMAL STRING half-up;
# DuckDB's rounds x*10^n in FP — they disagree in BOTH directions on
# boundary doubles (operators/oracle_helpers.py has the forensics; the r9
# cross-scale sweeps caught four live divergences of this class). Rather
# than hand-editing ~500 oracle ROUND sites (and every future one), the
# registry rewrites each plain ROUND(expr[, n]) in oracle SQL into the
# Spark-exact spark_round form AT REGISTRATION, innermost-first, so no
# plain ROUND over a possibly-FP expression ever reaches DuckDB. The
# rewrite is a value no-op off rounding boundaries (and exactly Spark's
# answer on them), so a green oracle cannot change hash on benign data.
# tests/test_registry_round.py pins the rewriter; the all_oracles() gate
# there asserts zero unrewritten sites registry-wide.
# ---------------------------------------------------------------------------

_ROUND_TOKEN = re.compile(r"(?<![A-Za-z0-9_])ROUND\s*\(", re.IGNORECASE)
# spark_round()'s own generated text — already Spark-exact, never rewritten
_GENERATED_PREFIX = "ROUND(CAST(CAST(("


def _skip_quoted(sql: str, i: int) -> int:
    """Given i at an opening single quote, return the index just past the
    literal (handles '' escapes)."""
    j = i + 1
    while j < len(sql):
        if sql[j] == "'":
            if j + 1 < len(sql) and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return j


def _round_args(sql: str, open_paren: int) -> tuple[list[str], int] | None:
    """Parse the balanced, quote-aware argument list starting after
    ``open_paren``; returns (top-level args, index past the close paren)."""
    depth, j, last, args = 1, open_paren + 1, open_paren + 1, []
    while j < len(sql):
        c = sql[j]
        if c == "'":
            j = _skip_quoted(sql, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[last:j])
                return args, j + 1
        elif c == "," and depth == 1:
            args.append(sql[last:j])
            last = j + 1
        j += 1
    return None


def _masked(sql: str) -> str:
    """Copy of ``sql`` with single-quoted literals blanked (same length),
    so token searches can't match inside strings."""
    out, i = [], 0
    while i < len(sql):
        if sql[i] == "'":
            j = _skip_quoted(sql, i)
            out.append("'" + "\x00" * (j - i - 2) + "'" if j - i >= 2 else sql[i:j])
            i = j
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


def _first_plain_round(masked: str, pos: int = 0) -> int | None:
    """Index of the next plain (non-generated) ROUND( token, or None."""
    while True:
        m = _ROUND_TOKEN.search(masked, pos)
        if m is None:
            return None
        if masked.startswith(_GENERATED_PREFIX, m.start()):
            pos = m.end()
            continue
        return m.start()


def sparkify_round(sql: str) -> str:
    """Rewrite every plain ROUND(expr[, n]) in ``sql`` to the Spark-exact
    ``spark_round`` form, innermost-first (so a nested ROUND is rewritten
    before the outer one quadruplicates its text). Raises on a site the
    rewriter cannot prove safe (non-literal or negative scale) — those
    must be converted by hand."""
    from .operators.oracle_helpers import spark_round

    while True:
        masked = _masked(sql)
        pos, target = 0, None
        while True:
            start = _first_plain_round(masked, pos)
            if start is None:
                break
            open_paren = masked.index("(", start)
            parsed = _round_args(sql, open_paren)
            if parsed is None:
                raise ValueError(
                    f"unbalanced ROUND( at {start}: {sql[start:start + 80]!r}"
                )
            args, end = parsed
            if _first_plain_round(masked[open_paren + 1 : end]) is not None:
                # an inner plain ROUND lives in the args: the forward scan
                # will reach it next — rewrite innermost-first
                pos = open_paren + 1
                continue
            target = (start, args, end)
            break
        if target is None:
            return sql
        start, args, end = target
        if len(args) == 1:
            n = 0
        elif len(args) == 2 and re.fullmatch(r"\s*\d+\s*", args[1]):
            n = int(args[1])
        else:
            raise ValueError(
                f"ROUND site not rewritable (non-literal scale): {args!r}"
            )
        sql = sql[:start] + spark_round(args[0].strip(), n) + sql[end:]


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
            # Spark-exact ROUND at registration (see block comment above):
            # no plain ROUND over a possibly-FP expression reaches DuckDB
            try:
                _ORACLES[name] = sparkify_round(oracle)
            except ValueError as e:
                raise ValueError(f"{name}: {e}") from e
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
    # imported AFTER its constituents: the capstone's oracle composes
    # text/training/dedup/similarity oracle strings at decoration time
    from .operators import pipelines  # noqa: F401


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

# Keys the round VERDICT asked to front into the next driver window —
# same promotion treatment as _SEMANTICS_CHANGED, same removal contract
# (drop once re-sampled). r13's four entries (q_repetition_gopher_zipf,
# q_repetition_signals, q_map_funcs, q_semdedup_scaled) were all
# re-sampled green in CORRECTNESS_r13 and are removed per the contract.
# r14: every key whose dataflow this optimization round touched — the
# semdedup family (probe restructure, uniform bigint cell, zero-norm
# guard) and the bigram-LM chain (size-gated bgc materialization) —
# fronted so the shipped forms carry THIS round's driver verdicts, not
# last round's.
_VERDICT_REFRESH: set[str] = {
    "q_semdedup",
    "q_semdedup_joined",
    "q_semdedup_scaled",
    "q_semdedup_hier",
    "q_bigram_lm_score",
    "q_perplexity_buckets",
    "q_perplexity_zipf",
    "q_perplexity_filter_approx",
    "q_zipf_curation_pipeline",
    "q_corpus_prep",
    "q_corpus_prep_scaled",
}


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
        fronted = upgraded or k in _SEMANTICS_CHANGED or k in _VERDICT_REFRESH
        promoted = rnd < 0 or fronted
        bucket = 0 if red else (1 if promoted else 2)
        # upgraded / semantics-changed / verdict-refresh keys carry NEW
        # claims (oracle, semantics, or a changed implementation) —
        # they must reach the next 50-key window even while the
        # never-sampled backlog (rnd == -1) exceeds one window, so they
        # sort ahead of it (there are only ever a handful per round)
        if bucket == 1 and fronted:
            rnd = -2
        return bucket, rnd, _MODULE_PRIORITY.get(mod, 99)

    return sorted(keys, key=rank)


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {k: _QUERIES[k] for k in _rotated(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {k: _ORACLES[k] for k in _rotated(list(_QUERIES)) if k in _ORACLES}
