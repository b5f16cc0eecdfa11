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
