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
fixtures changed. DuckDB-only (no Spark session): minutes per SF.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
THREAD_ARMS = (8, 1)


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
    for sf in sfs:
        n = 0
        for i, (name, sql) in enumerate(oracles.items()):
            n += 1
            try:
                arms = [run_arm(sql, sf, t) for t in THREAD_ARMS]
            except Exception as e:  # noqa: BLE001 - report-and-continue
                flagged.append((sf, f"{name}: ERROR {str(e)[:120]}"))
                continue
            if any(a != arms[0] for a in arms[1:]):
                diffs = [
                    (a, b)
                    for a, b in zip(arms[0], arms[1])
                    if a != b
                ][:3]
                flagged.append((sf, f"{name}: order-sensitive {diffs}"))
                print(f"FLAG {sf} {name}: {str(diffs)[:200]}", flush=True)
            if i % 60 == 0:
                print(f"...{sf} {i} keys in", flush=True)
        print(
            f"{sf}: {n - sum(1 for f in flagged if f[0] == sf)}/{n} "
            "order-stable",
            flush=True,
        )
    print(f"RESULT: {len(flagged)} flagged across {len(sfs)} scale(s)")
    for sf, msg in flagged:
        print(" -", sf, msg)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
