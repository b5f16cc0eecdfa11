#!/usr/bin/env python
"""Exact driver-gate simulation: run the FIRST N keys of queries() (the
rotation-ordered window the round driver samples) against their DuckDB
oracles at sf0.01, fresh-process, using the same comparator the local
parity suite mirrors (tests/oracle_utils.assert_matches_oracle).

    python tools/driver_sim.py [N]       # default N=50, the driver's window

Run this before a round ends: a green run here means CORRECTNESS_r{N}
should come back green, because it exercises the same keys in the same
order with the same compare."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF = "/root/testdata/sf0.01"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import __spark_entry__ as mod
    from oracle_utils import assert_matches_oracle

    from aram_matchdata_etl_spark.session import get_spark

    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    qs, oracles = mod.queries(), mod.oracle_sql()
    rows = mod.entry(spark).count()
    print(f"entry smoke: {rows} rows")
    fails: list[str] = []
    for i, name in enumerate(list(qs)[:n]):
        try:
            if name in oracles:
                assert_matches_oracle(
                    qs[name](spark, SF), oracles[name], SF, name=name
                )
                print(f"{i:3d} {name} PASS")
            else:
                cnt = qs[name](spark, SF).count()
                print(f"{i:3d} {name} rows-only ({cnt} rows)")
        except Exception as e:  # noqa: BLE001 - report-and-continue harness
            fails.append(name)
            print(f"{i:3d} {name} FAIL: {str(e)[:200]}")
    print(f"result: {n - len(fails)}/{n} green; fails: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
