#!/usr/bin/env python
"""Constrained-memory bench arm (r8 verdict item 2): the single-node
10x scale tier proves sub-linear ALGORITHMIC scaling, but in a 128 GiB
heap nothing ever spills — so it cannot see the multi-node pathology
class where per-task state exceeds executor memory. This probe closes
that gap locally: re-run the most shuffle-heavy scale-path queries on
the 10x tier inside a deliberately SMALL heap (executor-per-core memory
comparable to a lean production executor) and confirm the engine
degrades by SPILLING — tasks go through ExternalSorter/ExternalAppendOnly
spill files and finish — instead of hitting an OOM cliff.

    python tools/spill_probe.py              # both arms, prints a table
    python tools/spill_probe.py --child ...  # internal: one arm

Arms (fresh JVM each, because spark.driver.memory is launch-time):
  baseline     24g heap (the bench default)       — expect zero spill
  constrained  2g heap, spark.memory.fraction=0.2, 8 shuffle partitions
               — ~12 MiB execution memory per task slot AND partitions
               ~4x fatter than the headline config (the fat-partition
               shape a mis-sized production job produces); the 10x
               shuffles must go through spill files

Each child runs every query once UNTIMED first (whole-stage-codegen JIT
parity — without it the second JVM always looks faster), then timed.

The child sums memoryBytesSpilled / diskBytesSpilled across stages from
the AppStatusStore after each query. Verdict per query: OK+spilled /
OK+fit / FAIL(OOM or error). Results are recorded in SCALE.md
("constrained-memory arm"); re-run when a scale-path plan changes
shape. Not part of pytest (two extra JVMs + the 10x tier ~ minutes);
the end-of-round checklist covers recurrence."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The shuffle-heaviest scale-path queries (verdict list): LSH banding +
# connected components, the two biggest TPC-H fact joins, inverted-index
# scoring, and corpus term aggregation — plus (r9 widening) the
# window-cascade family (WindowExec sorts are the classic spill
# operator) and the vocabulary-scale PageRank chain.
PROBE_QUERIES = [
    "q_dedup_clusters_lsh",
    "q_tpch_q9",
    "q_tpch_q21",
    "q_bm25_topk",
    "q_tfidf",
    "q_anomaly_zscore",
    "q_funnel",
    "q_textrank_keywords",
    # r13: the production semdedup key localCheckpoints the cell
    # assignment before the auto-cap probe — under a lean heap that
    # materialization must degrade to block-manager disk, not OOM
    "q_semdedup_scaled",
    # r13: the hierarchical twin localCheckpoints coarse + long-form
    # point frames besides the cell assignment — three materializations
    # that must all degrade to block-manager disk under a lean heap
    "q_semdedup_hier",
]

ARMS = {
    # heap, extra conf
    "baseline": ("24g", {}),
    "constrained": (
        "2g",
        {
            "spark.memory.fraction": "0.2",
            "spark.sql.shuffle.partitions": "8",
        },
    ),
}


def _spill_totals(spark) -> tuple[int, int] | None:
    """Sum (memoryBytesSpilled, diskBytesSpilled) over all completed
    stages via the AppStatusStore (UI stays disabled; the store is
    maintained regardless). private[spark] is public in bytecode, so
    py4j can call statusStore().

    Hard-codes the Spark 4 private stageList signature — a minor-version
    bump can change it, so failure degrades to None ("spill metrics
    unavailable") rather than killing the timing arms with a py4j error.
    """
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        # Spark 4 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — py4j sees no default args, so
        # pass all five; empty status filter = all stages
        jvm = spark.sparkContext._jvm
        gw = spark.sparkContext._gateway
        it = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        ).iterator()
        mem = disk = 0
        while it.hasNext():
            s = it.next()
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
        return int(mem), int(disk)
    except Exception as e:  # noqa: BLE001 - private-API probe, timing must survive
        print(
            "spill metrics unavailable (Spark internals changed?): "
            f"{str(e).splitlines()[0][:120]}",
            flush=True,
        )
        return None


def child(arm: str, tier_dir: str) -> None:
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.session import get_spark

    heap, conf = ARMS[arm]
    assert os.environ.get("SPARK_DRIVER_MEMORY") == heap
    spark = get_spark(app_name=f"spill-probe-{arm}", extra_conf=conf)
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        spark.catalog.clearCache()
        try:
            # untimed warmup: pays whole-stage-codegen JIT so arm timings
            # compare plans, not compiler state
            qs[name](spark, tier_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 - timed run reports the failure
            pass
        spark.catalog.clearCache()
        before = _spill_totals(spark)
        t0 = time.perf_counter()
        try:
            qs[name](spark, tier_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.perf_counter() - t0, 3)
            after = _spill_totals(spark)
            out[name] = {"sec": sec, "ok": True}
            if before is not None and after is not None:
                out[name]["spill_mem_mb"] = round((after[0] - before[0]) / 2**20, 1)
                out[name]["spill_disk_mb"] = round((after[1] - before[1]) / 2**20, 1)
            else:
                out[name]["spill_metrics"] = "unavailable"
        except Exception as e:  # noqa: BLE001 - the cliff IS the finding
            out[name] = {
                "sec": round(time.perf_counter() - t0, 3),
                "ok": False,
                "err": str(e).splitlines()[0][:200],
            }
    print("SPILL_PROBE_JSON:" + json.dumps({"arm": arm, "heap": heap, "q": out}))


def main() -> int:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1], sys.argv[-1])
        return 0

    # materialize the 10x tier with a normal-size session (reuses the
    # bench's cached copy when fresh)
    from bench import SCALE_TIER_K, build_scale_tier_dir
    from aram_matchdata_etl_spark.session import default_sf_dir, get_spark

    tier_dir = os.path.join(REPO, ".bench_scale_tier")
    spark = get_spark(app_name="spill-probe-build")
    build_scale_tier_dir(spark, default_sf_dir(), tier_dir, SCALE_TIER_K)
    spark.stop()

    results = {}
    for arm, (heap, _) in ARMS.items():
        env = dict(os.environ, SPARK_DRIVER_MEMORY=heap)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", arm, tier_dir],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        payload = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("SPILL_PROBE_JSON:")
        ]
        if not payload:
            print(f"{arm}: child produced no result line; stderr tail:")
            print("\n".join(proc.stderr.splitlines()[-15:]))
            return 1
        results[arm] = json.loads(payload[0].split(":", 1)[1])

    print(f"{'query':28s} {'base s':>8s} {'cons s':>8s} {'x':>5s} "
          f"{'spill MiB (mem/disk)':>22s} verdict")
    failures = []
    for name in PROBE_QUERIES:
        b = results["baseline"]["q"][name]
        c = results["constrained"]["q"][name]
        if not c["ok"]:
            failures.append((name, c["err"]))
            print(f"{name:28s} {b.get('sec', -1):8.2f} {'FAIL':>8s}  -- {c['err']}")
            continue
        ratio = c["sec"] / b["sec"] if b.get("ok") else float("nan")
        spilled = c["spill_mem_mb"] > 0 or c["spill_disk_mb"] > 0
        verdict = "OK+spilled" if spilled else "OK+fit"
        print(
            f"{name:28s} {b['sec']:8.2f} {c['sec']:8.2f} {ratio:5.1f} "
            f"{c['spill_mem_mb']:10.1f}/{c['spill_disk_mb']:<11.1f} {verdict}"
        )
    if failures:
        print(f"CLIFF: {failures}")
        return 1
    print("no cliff: every probe query completed in the constrained heap")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
