#!/usr/bin/env python
"""Targeted parity: run a named subset of oracled registry keys against
their DuckDB oracles at one or more fixture SFs with the driver-gate
comparator. Usage:

    python tools/targeted_parity.py KEY[,KEY...] [sf_dir ...]

Exists for optimization rounds: after restructuring one operator's
dataflow, re-prove exactly its consumer keys at every SF without the
20-40 min full-registry sweep (tools/parity_sweep.py)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    keys = sys.argv[1].split(",")
    sfs = sys.argv[2:] or DEFAULT_SFS

    from aram_matchdata_etl_spark.registry import all_oracles, all_queries
    from aram_matchdata_etl_spark.session import get_spark
    from oracle_utils import assert_matches_oracle

    queries, oracles = all_queries(), all_oracles()
    spark = get_spark(shuffle_partitions=8)
    failures = []
    for sf in sfs:
        for k in keys:
            if k not in queries:
                print(f"  {k}: NOT REGISTERED", flush=True)
                failures.append((sf, k, "missing"))
                continue
            t0 = time.time()
            try:
                if k in oracles:
                    assert_matches_oracle(
                        queries[k](spark, sf), oracles[k], sf
                    )
                    verdict = "PASS"
                else:
                    n = queries[k](spark, sf).count()
                    verdict = f"rows-only ({n} rows)"
            except Exception as exc:  # noqa: BLE001
                verdict = f"FAIL: {exc}"
                failures.append((sf, k, str(exc)[:200]))
            print(
                f"  {os.path.basename(sf)} {k}: {verdict}"
                f" [{time.time() - t0:.1f}s]",
                flush=True,
            )
    print(f"result: {len(failures)} failures")
    for sf, k, msg in failures:
        print(f"  FAIL {os.path.basename(sf)} {k}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
