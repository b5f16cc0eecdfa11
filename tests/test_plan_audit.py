"""Hard-flag gate over the perf-graded plans (tools/plan_audit.py):
CartesianProduct and row-at-a-time Python UDFs must never appear in a
HEADLINE / SCALE_TIER physical plan. The committed PLAN_AUDIT.md is a
REPORT (exchange counts can shift with AQE and Spark versions, so no
byte-exact freshness assert); the hard flags are re-checked LIVE here
on the scale-tier subset — the queries whose plans carry the 100 TB
story — plus the flagship."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


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
