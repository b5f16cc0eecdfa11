#!/usr/bin/env python
"""Automated physical-plan audit of the perf-graded query set.

Institutionalizes the by-hand plan reading done each round: for every
HEADLINE + SCALE_TIER query, build the physical plan at sf0.01 and scan
it for the red flags that plan audits keep catching by eye —

  - CartesianProduct: an unintended all-pairs join (always a bug in
    this engine; intended bounded cross joins compile to
    BroadcastNestedLoopJoin with a tiny build side instead);
  - row-at-a-time Python UDFs (BatchEvalPython): the slow path this
    engine bans in favor of built-ins / Arrow;
  - parquet scans that read every column (no ReadSchema pruning);
  - per-plan Exchange count (shuffle budget — tracked, not asserted).

Writes PLAN_AUDIT.md (committed; regenerate after plan-shape changes:
`python tools/plan_audit.py`). tests/test_plan_audit.py asserts the
hard flags stay at zero without re-running the full audit in CI.

`python tools/plan_audit.py --all` sweeps EVERY registry key (the
run that caught q_udtf_chunks' row-serialized UDTF in r8) and writes
PLAN_AUDIT_ALL.md; the end-of-round checklist (ROADMAP.md) requires a
fresh sweep per round and tests/test_plan_audit.py gates the artifact
against the live registry (key-count staleness + zero hard flags).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"

HARD_FLAGS = {
    # pattern -> why it's a defect in this engine
    "CartesianProduct": "unintended all-pairs join",
    "BatchEvalPython": "row-at-a-time Python UDF in the plan",
}


def audit(names: list[str] | None = None) -> dict[str, dict]:
    from bench import HEADLINE, SCALE_TIER
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    qs = all_queries()
    if names is None:
        names = list(dict.fromkeys(list(HEADLINE) + list(SCALE_TIER)))
    out: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = [p for p in HARD_FLAGS if p in plan]
        out[name] = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "codegen": "WholeStageCodegen" in plan
            or "AdaptiveSparkPlan" in plan,
            "flags": flags,
        }
    return out


def render(results: dict[str, dict]) -> str:
    lines = [
        "# PLAN_AUDIT — physical-plan red-flag scan (generated)",
        "",
        f"{len(results)} perf-graded queries (HEADLINE + SCALE_TIER) planned",
        "at sf0.01. Regenerate with `python tools/plan_audit.py`.",
        "`exchanges` counts every Exchange operator mention (shuffle +",
        "broadcast + AQE reuse) — a budget to watch, not a defect;",
        "`bnlj` is BroadcastNestedLoopJoin, legitimate when one side is a",
        "bounded 1-row/constant frame (how Spark compiles scalar-subquery",
        "cross joins). HARD flags (CartesianProduct, BatchEvalPython)",
        "must stay empty — asserted by tests/test_plan_audit.py.",
        "",
        "| query | exchanges | broadcasts | bnlj | hard flags |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(results):
        r = results[name]
        lines.append(
            f"| `{name}` | {r['exchanges']} | {r['broadcasts']} | "
            f"{r['bnlj']} | {', '.join(r['flags']) or '—'} |"
        )
    flagged = {n: r["flags"] for n, r in results.items() if r["flags"]}
    lines += [
        "",
        f"Hard-flagged queries: {flagged if flagged else 'none'}",
        "",
    ]
    return "\n".join(lines)


def render_all(results: dict[str, dict]) -> str:
    """Compact full-registry artifact: hard-flag summary + shuffle budget
    outliers only (the per-key table lives in PLAN_AUDIT.md for the
    perf-graded set; here the signal is 'zero hard flags over N keys')."""
    flagged = {n: r["flags"] for n, r in results.items() if r["flags"]}
    heavy = sorted(
        ((n, r["exchanges"]) for n, r in results.items()),
        key=lambda t: -t[1],
    )[:15]
    lines = [
        "# PLAN_AUDIT_ALL — full-registry physical-plan sweep (generated)",
        "",
        f"keys_audited: {len(results)}",
        f"hard_flagged: {flagged if flagged else 'none'}",
        "",
        "Regenerate per round with `python tools/plan_audit.py --all`",
        "(end-of-round checklist, ROADMAP.md). The staleness + zero-flag",
        "gate is tests/test_plan_audit.py::test_full_registry_sweep_fresh.",
        "",
        "Top-15 exchange counts (budget watch, not defects — fixed-round",
        "iterative chains legitimately carry many small exchanges):",
        "",
        "| query | exchanges |",
        "|---|---|",
    ]
    for name, ex in heavy:
        lines.append(f"| `{name}` | {ex} |")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    full = "--all" in sys.argv[1:]
    if full:
        from aram_matchdata_etl_spark.registry import all_queries

        results = audit(list(all_queries()))
        content = render_all(results)
        out = os.path.join(REPO, "PLAN_AUDIT_ALL.md")
    else:
        results = audit()
        content = render(results)
        out = os.path.join(REPO, "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write(content)
    flagged = {n: r["flags"] for n, r in results.items() if r["flags"]}
    print(f"wrote {out}: {len(results)} plans, hard-flagged: {flagged or 'none'}")


if __name__ == "__main__":
    main()
