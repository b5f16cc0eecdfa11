"""Hard-flag gate over the perf-graded plans (tools/plan_audit.py):
CartesianProduct and row-at-a-time Python UDFs must never appear in a
HEADLINE / SCALE_TIER physical plan. The committed PLAN_AUDIT.md is a
REPORT (exchange counts can shift with AQE and Spark versions, so no
byte-exact freshness assert); the hard flags are re-checked LIVE here
on the scale-tier subset — the queries whose plans carry the 100 TB
story — plus the flagship."""

from __future__ import annotations

import pytest

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.slow
def test_no_hard_flags_in_scale_tier_plans(spark):
    from plan_audit import HARD_FLAGS, SF

    from bench import SCALE_TIER
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    for name in list(SCALE_TIER) + ["q_player_rank"]:
        plan = qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        hits = [p for p in HARD_FLAGS if p in plan]
        assert not hits, f"{name}: hard plan flags {hits}\n{plan[:2000]}"


def test_committed_audit_reports_no_hard_flags():
    with open(os.path.join(REPO, "PLAN_AUDIT.md")) as f:
        content = f.read()
    m = re.search(r"Hard-flagged queries: (.*)", content)
    assert m is not None, "PLAN_AUDIT.md missing its summary line"
    assert m.group(1).strip() == "none", m.group(0)


@pytest.mark.slow
def test_global_windows_are_allowlisted(spark):
    """Soft-flag gate (r9 verdict item 6): every unpartitioned WindowExec
    must belong to a documented rollup-bounded operator. Live-checked on
    the perf-graded set plus the new-in-r10 approx twin (whose whole
    point is a global-window-free plan); the full registry is covered by
    the committed sweep's global_window_unlisted line."""
    from plan_audit import GLOBAL_WINDOW_ALLOWLIST, SF, count_global_windows

    from bench import HEADLINE, SCALE_TIER
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    names = list(dict.fromkeys(list(HEADLINE) + list(SCALE_TIER))) + [
        "q_quantile_normalize",
        "q_quantile_normalize_approx",
    ]
    offenders = {}
    for name in names:
        plan = qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        n = count_global_windows(plan)
        if n and name not in GLOBAL_WINDOW_ALLOWLIST:
            offenders[name] = n
    assert not offenders, (
        f"undocumented global windows: {offenders} — repartition, or "
        "document the bounded input and add to GLOBAL_WINDOW_ALLOWLIST"
    )
    # the approx twin's plan must stay free of global windows: that IS
    # its 100 TB claim vs the exact twin (which is allowlisted)
    plan = (
        qs["q_quantile_normalize_approx"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert count_global_windows(plan) == 0, plan[:2000]
    # allowlist staleness: every listed key must still exist
    dead = GLOBAL_WINDOW_ALLOWLIST - set(qs)
    assert not dead, f"allowlisted keys no longer registered: {dead}"


def test_committed_sweep_has_no_unlisted_global_windows():
    with open(os.path.join(REPO, "PLAN_AUDIT_ALL.md")) as f:
        content = f.read()
    m = re.search(r"global_window_unlisted: (.*)", content)
    assert m is not None, (
        "PLAN_AUDIT_ALL.md predates the global-window flag — re-run "
        "`python tools/plan_audit.py --all`"
    )
    assert m.group(1).strip() == "none", m.group(0)


def test_full_registry_sweep_fresh():
    """The per-round full sweep (`python tools/plan_audit.py --all`,
    end-of-round checklist) must exist, report zero hard flags, and
    cover the CURRENT registry — a new operator without a re-sweep
    fails here, same pattern as the OPERATORS.md staleness gate."""
    from aram_matchdata_etl_spark.registry import all_queries

    path = os.path.join(REPO, "PLAN_AUDIT_ALL.md")
    assert os.path.exists(path), (
        "PLAN_AUDIT_ALL.md missing — run `python tools/plan_audit.py --all`"
    )
    with open(path) as f:
        content = f.read()
    m = re.search(r"keys_audited: (\d+)", content)
    assert m is not None, "PLAN_AUDIT_ALL.md missing keys_audited line"
    live = len(all_queries())
    assert int(m.group(1)) == live, (
        f"stale sweep: audited {m.group(1)} keys, registry has {live} — "
        "re-run `python tools/plan_audit.py --all`"
    )
    f2 = re.search(r"hard_flagged: (.*)", content)
    assert f2 is not None and f2.group(1).strip() == "none", (
        f2.group(0) if f2 else "missing hard_flagged line"
    )
