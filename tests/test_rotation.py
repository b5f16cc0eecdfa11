"""Unit tests for the driver-sample rotation (registry._rotated): the
driver hash-verifies only the FIRST 50 keys of queries() per round, so
ordering bugs silently waste sampling rounds. Pure-python — no Spark.

Order contract: previously-FAILED keys first, then the promoted bucket
(oracle-upgraded and semantics-changed keys ahead of never-sampled —
upgrades carry NEW hash claims and must not wait out a multi-window
never-sampled backlog), then green keys stalest-first.
"""

from __future__ import annotations

import aram_matchdata_etl_spark.registry as reg


def _fake_queries(keys):
    def fn(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError

    fn.__module__ = "aram_matchdata_etl_spark.operators.fake"
    return {k: fn for k in keys}


def test_rotation_order(monkeypatch):
    keys = [
        "q_green_old",      # sampled r2, green
        "q_green_new",      # sampled r7, green
        "q_red",            # sampled r7, FAILED
        "q_never",          # never sampled
        "q_upgraded",       # sampled r5 rows-only, has an oracle now
        "q_semantics",      # sampled r4 green, semantics changed since
    ]
    monkeypatch.setattr(reg, "_QUERIES", _fake_queries(keys))
    monkeypatch.setattr(
        reg,
        "_ORACLES",
        {k: "SELECT 1" for k in keys if k != "q_never"},
    )
    monkeypatch.setattr(reg, "_SEMANTICS_CHANGED", {"q_semantics"})
    monkeypatch.setattr(
        reg,
        "_sampled_rounds",
        lambda: {
            "q_green_old": (2, False, False),
            "q_green_new": (7, False, False),
            "q_red": (7, True, False),
            "q_upgraded": (5, False, True),
            "q_semantics": (4, False, False),
        },
    )
    order = reg._rotated(list(keys))
    # failed key leads unconditionally
    assert order[0] == "q_red"
    # promoted bucket: upgraded + semantics-changed ahead of never-sampled
    assert order[1:4] == ["q_upgraded", "q_semantics", "q_never"] or order[
        1:4
    ] == ["q_semantics", "q_upgraded", "q_never"]
    # green keys recycle stalest-first
    assert order[4:] == ["q_green_old", "q_green_new"]


def test_rotation_verdict_refresh_fronted(monkeypatch):
    """A key in _VERDICT_REFRESH (implementation changed after its last
    driver verdict, or the verdict aged out) is fronted into the next
    window exactly like a semantics-changed key — ahead of the
    never-sampled backlog, behind nothing but failed keys."""
    keys = ["q_green_new", "q_never", "q_refresh", "q_red"]
    monkeypatch.setattr(reg, "_QUERIES", _fake_queries(keys))
    monkeypatch.setattr(reg, "_ORACLES", {k: "SELECT 1" for k in keys})
    monkeypatch.setattr(reg, "_SEMANTICS_CHANGED", set())
    monkeypatch.setattr(reg, "_VERDICT_REFRESH", {"q_refresh"})
    monkeypatch.setattr(
        reg,
        "_sampled_rounds",
        lambda: {
            "q_green_new": (7, False, False),
            "q_refresh": (11, False, False),  # recent verdict, stale code
            "q_red": (7, True, False),
        },
    )
    assert reg._rotated(list(keys)) == [
        "q_red", "q_refresh", "q_never", "q_green_new",
    ]


def test_rotation_r13_window_fronts_verdict_refresh_keys():
    """The real registry's next 50-key window must carry every
    _VERDICT_REFRESH key (VERDICT r12 item 2)."""
    window = list(reg.all_queries())[:50]
    missing = reg._VERDICT_REFRESH - set(window)
    assert not missing, missing


def test_rotation_rows_only_without_oracle_not_promoted(monkeypatch):
    """A rows-only key that still has NO oracle is not an 'upgrade' —
    it recycles with the green bucket by staleness."""
    keys = ["q_rows_only", "q_never"]
    monkeypatch.setattr(reg, "_QUERIES", _fake_queries(keys))
    monkeypatch.setattr(reg, "_ORACLES", {})
    monkeypatch.setattr(reg, "_SEMANTICS_CHANGED", set())
    monkeypatch.setattr(
        reg, "_sampled_rounds", lambda: {"q_rows_only": (3, False, True)}
    )
    assert reg._rotated(list(keys)) == ["q_never", "q_rows_only"]
