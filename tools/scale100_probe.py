#!/usr/bin/env python
"""One-off 100x tier: the literal answer to "would this plan survive a
100x scale-up?". The shipped bench tier runs at 10x every round and the
r8 one-off extended the curve to 30x (SCALE.md "second tripling"); this
probe extends it through a full second order of magnitude on the same
replication recipe (bench.build_scale_tier_dir — key domains, join
strides, vocabulary, and embedding perturbation all scale with k, so
the workload SHAPE is preserved, not just the byte count).

    python tools/scale100_probe.py [k] [query ...]
        # default: k=100 over the seven load-bearing queries of the
        # r8 30x table, warmup + best-of-2 each (the tier protocol)

Prints a markdown table of seconds and the k-x-to-1x ratio (using the
1x seconds passed on the command line is deliberately NOT supported —
re-measure 1x in the same process so both arms share JIT/OS state).
Writes nothing; paste the table into SCALE.md with the loadavg line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q_dedup_minhash_lsh",
    "q_dedup_clusters_lsh",
    "q_pagerank",
    "q_bm25_topk",
    "q_anomaly_zscore",
    "q_count_distinct",
    "q_tpch_q21",
]

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best_of_2(fn, spark, d: str) -> float:
    spark.catalog.clearCache()
    fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or DEFAULT_QUERIES

    from bench import build_scale_tier_dir

    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.session import get_spark

    spark = get_spark(app_name=f"scale{k}-probe")
    tier_dir = f"/tmp/.scale_tier_{k}x"
    print(f"loadavg {os.getloadavg()}")
    t0 = time.perf_counter()
    build_scale_tier_dir(spark, SRC, tier_dir, k)
    print(f"built {k}x tier in {time.perf_counter() - t0:.1f}s -> {tier_dir}")

    qs = all_queries()
    rows = []
    for name in names:
        one = best_of_2(qs[name], spark, SRC)
        big = best_of_2(qs[name], spark, tier_dir)
        rows.append((name, one, big, big / one))
        print(f"  {name}: 1x {one:.2f}s  {k}x {big:.2f}s  ratio {big / one:.1f}x")

    print(f"\n| query | 1x s | {k}x s | {k}x ratio |")
    print("|---|---|---|---|")
    for name, one, big, r in rows:
        print(f"| {name} | {one:.2f} | {big:.2f} | {r:.1f}x |")
    print(f"\nloadavg after: {os.getloadavg()}")
    print(json.dumps({n: round(r, 1) for n, _, _, r in rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
