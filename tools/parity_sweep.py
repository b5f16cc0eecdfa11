#!/usr/bin/env python
"""Cross-scale parity sweep: run EVERY oracled registry key against its
DuckDB oracle at a chosen fixture scale, with the same comparator as
the driver gate.

    python tools/parity_sweep.py [sf_dir ...]   # default: sf0.001 sf0.1

The driver gate and the local parity suite both run at sf0.01 only, so
divergences that need more (or less) data to manifest never reach
them. The r9 campaign that introduced this sweep found four real ones,
all FP-boundary classes (operators/oracle_helpers.py documents the
worst: Spark rounds a double's shortest decimal STRING half-up, DuckDB
rounds x*10^n in FP — they disagree in both directions):

  - q_tpch_q2 at sf0.001: ROUND boundary on a min unit price;
  - q_interarrival_burstiness at sf0.1: ROUND boundary on a mean;
  - q_anomaly_zscore(+chunked) at sf0.1: DuckDB -0.0 vs Spark 0.0;
  - q_groupby_salted at sf0.1: FP-sum reorder ulp crossing ROUND(,4)
    (fixed by exact integer-cents aggregation).

Recurrence: end-of-round checklist (ROADMAP.md) — run after any oracle
or fixture change; each sf arm takes ~20-40 min (sf0.1 dominates).
Not in pytest: two full-registry DuckDB+Spark passes are far beyond
the suite budget."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]


def main() -> int:
    sfs = sys.argv[1:] or DEFAULT_SFS

    import __spark_entry__ as mod
    from oracle_utils import assert_matches_oracle

    from aram_matchdata_etl_spark.session import get_spark

    spark = get_spark(app_name="parity-sweep", shuffle_partitions=8)
    qs, oracles = mod.queries(), mod.oracle_sql()
    fails: list[tuple[str, str, str]] = []
    for sf in sfs:
        n = 0
        for i, name in enumerate(qs):
            if name not in oracles:
                continue
            n += 1
            try:
                assert_matches_oracle(qs[name](spark, sf), oracles[name], sf, name=name)
            except Exception as e:  # noqa: BLE001 - report-and-continue harness
                fails.append((sf, name, str(e).splitlines()[0][:160]))
                print(f"FAIL {sf} {name}: {str(e)[:160]}", flush=True)
            if i % 40 == 0:
                print(f"...{sf} {i} keys in", flush=True)
        print(f"{sf}: {n - sum(1 for f in fails if f[0] == sf)}/{n} green", flush=True)
    print(f"RESULT: {len(fails)} failures across {len(sfs)} scale(s)")
    for sf, name, err in fails:
        print(" -", sf, name, err)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
