#!/usr/bin/env python
"""Aggregation-order sensitivity probe over every registered oracle.

The r9/r10 campaigns closed the Spark-vs-DuckDB ROUND-boundary class
structurally (registry.sparkify_round), leaving ONE residual FP class:
an aggregation-order ulp moving a value across a rounding boundary (the
q_groupby_salted pattern — fixed there by exact integer cents). Sites
with that exposure cannot be enumerated statically, but they CAN be
smoked out: DuckDB's own accumulation order changes with its thread
count, so evaluating each oracle under threads=8 and threads=1 and
comparing canonicalized results flags every site whose output is
order-sensitive AT THE CURRENT FIXTURES — the exact precondition for a
cross-engine divergence. (This probe retroactively catches the
q_heaps_fit degenerate-regr_r2 flake the r10 sweep found by luck.)

    python tools/order_sensitivity_probe.py [sf_dir ...]
        # default: sf0.01 sf0.1

A flagged key is NOT necessarily red at the driver — it means the value
the hash gate pins is within FP noise of moving, i.e. a latent flake.
Fix pattern: exact-integer reformulation (cents/microseconds) or a
degenerate-case guard, per operators/oracle_helpers.py forensics.

Recurrence: end-of-round checklist (ROADMAP.md) when oracles or
fixtures changed. DuckDB-only (no Spark session). Runtime budget: the
threads=1 arm is brutal on the intentionally-quadratic exact-baseline
oracles at sf0.1 (the first full run spent ~2h there), so the alternate
arm adapts to the measured first-arm time — threads=1 when the 8-thread
run was fast, threads=4 (still a different merge order) when it was
slow, skipped entirely above SKIP_BUDGET_S with the skip reported. This
keeps the whole probe to minutes at sf0.01 and tens of minutes at sf0.1
while every cheap key still gets the most extreme order change.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
FIRST_ARM_THREADS = 8
SLOW_KEY_S = 10.0  # first arm slower than this -> alternate uses 4 threads
SKIP_BUDGET_S = 90.0  # first arm slower than this -> skip alternate, report


def canon(df) -> list[tuple]:
    from oracle_utils import normalize

    return normalize(df)


def run_arm(sql: str, sf_dir: str, threads: int):
    import duckdb

    from aram_matchdata_etl_spark.sources.tables import TABLES

    con = duckdb.connect()
    try:
        con.sql(f"SET threads={threads}")
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return canon(con.sql(sql).df())
    finally:
        con.close()


def main() -> int:
    sfs = sys.argv[1:] or DEFAULT_SFS

    from aram_matchdata_etl_spark.registry import all_oracles

    oracles = all_oracles()
    flagged: list[tuple[str, str]] = []
    skipped: list[tuple[str, str]] = []
    for sf in sfs:
        n = 0
        for i, (name, sql) in enumerate(oracles.items()):
            n += 1
            try:
                t0 = time.perf_counter()
                first = run_arm(sql, sf, FIRST_ARM_THREADS)
                first_s = time.perf_counter() - t0
                if first_s > SKIP_BUDGET_S:
                    skipped.append((sf, f"{name} ({first_s:.0f}s)"))
                    print(
                        f"SKIP alternate arm {sf} {name}: first arm "
                        f"{first_s:.0f}s > {SKIP_BUDGET_S:.0f}s budget",
                        flush=True,
                    )
                    continue
                alt_threads = 1 if first_s < SLOW_KEY_S else 4
                alt = run_arm(sql, sf, alt_threads)
            except Exception as e:  # noqa: BLE001 - report-and-continue
                flagged.append((sf, f"{name}: ERROR {str(e)[:120]}"))
                continue
            if alt != first:
                diffs = [(a, b) for a, b in zip(first, alt) if a != b][:3]
                flagged.append((sf, f"{name}: order-sensitive {diffs}"))
                print(f"FLAG {sf} {name}: {str(diffs)[:200]}", flush=True)
            if i % 60 == 0:
                print(f"...{sf} {i} keys in", flush=True)
        print(
            f"{sf}: {n - sum(1 for f in flagged if f[0] == sf)}/{n} "
            "order-stable",
            flush=True,
        )
    print(
        f"RESULT: {len(flagged)} flagged across {len(sfs)} scale(s); "
        f"{len(skipped)} alternate arms skipped on budget"
    )
    for sf, msg in flagged:
        print(" -", sf, msg)
    for sf, msg in skipped:
        print(" - SKIPPED", sf, msg)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
