#!/usr/bin/env python
"""Per-query optimization probe (r13, guide §1 "measure first").

For each named query:
  - times DataFrame CONSTRUCTION separately from the noop-sink ACTION
    (construction catches eager driver work: Lloyd collect loops,
    localCheckpoints, probes);
  - runs bench.measure_query's exact protocol (clearCache + GC + untimed
    warmup + best-of-2) for the comparable number;
  - counts jobs/stages/tasks attributed to the query via the UI REST API
    (the session here enables the UI, unlike bench);
  - writes `.explain("formatted")` to plans/r14/<query>_<label>.txt.

Usage:
  python tools/perf_probe.py [--label before] [--no-plans] q_a q_b ...
  python tools/perf_probe.py --top        # the default expensive set
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOP = [
    "q_zipf_curation_pipeline",
    "q_perplexity_zipf",
    "q_semdedup",
    "q_pagerank",
    "q_textrank_keywords",
    "q_semdedup_scaled",
    "q_semdedup_hier",
    "q_setsim_zipf",
    "q_boilerplate_zipf",
    "q_dedup_clusters_lsh",
]


def rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    args = [a for a in sys.argv[1:]]
    label = "before"
    if "--label" in args:
        i = args.index("--label")
        label = args[i + 1]
        del args[i : i + 2]
    write_plans = "--no-plans" not in args
    args = [a for a in args if a != "--no-plans"]
    names = TOP if (not args or args == ["--top"]) else args

    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.session import default_sf_dir, get_spark

    import bench

    sf_dir = default_sf_dir()
    spark = get_spark(
        app_name="perf-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = "http://localhost:4040/api/v1"
    app_id = spark.sparkContext.applicationId
    queries = all_queries()
    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict = {}
    for name in names:
        fn = queries[name]
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"{name}: construct+warmup")
        jobs0 = len(rest(f"{ui}/applications/{app_id}/jobs"))
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        jobs_construct = len(rest(f"{ui}/applications/{app_id}/jobs")) - jobs0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_action_cold = time.perf_counter() - t0

        if write_plans:
            plan = queries[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{label}.txt"), "w") as f:
                f.write(plan)

        # bench-protocol number: warmup above counts as the untimed warmup
        best = float("inf")
        runs = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            jobs_a = len(rest(f"{ui}/applications/{app_id}/jobs"))
            t0 = time.perf_counter()
            d2 = fn(spark, sf_dir)
            t_c = time.perf_counter() - t0
            d2.write.format("noop").mode("overwrite").save()
            t_tot = time.perf_counter() - t0
            jobs_b = len(rest(f"{ui}/applications/{app_id}/jobs"))
            runs.append(
                {
                    "total": round(t_tot, 3),
                    "construct": round(t_c, 3),
                    "jobs": jobs_b - jobs_a,
                }
            )
            best = min(best, t_tot)
        out[name] = {
            "cold": {
                "construct": round(t_construct, 3),
                "construct_jobs": jobs_construct,
                "action": round(t_action_cold, 3),
            },
            "timed": runs,
            "best": round(best, 2),
        }
        print(f"{name}: best={best:.2f}s  {json.dumps(out[name])}", flush=True)
    print("SUMMARY " + json.dumps({n: v["best"] for n, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
