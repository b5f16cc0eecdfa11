"""OPERATORS.md must track the live registry (VERDICT r6 item 8): the
committed file is regenerated output, and count drift between doc and
registry is the kind of rot that creeps in at 222+ keys. One assertion:
committed bytes == generator output — instrumented (VERDICT r7 item 6)
to dump the symmetric difference of key sets on failure so a recurrence
of the one-time 371-vs-369 event is diagnosable from the CI log alone.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

_KEY_ROW = re.compile(r"^\| `([a-z0-9_]+)` \|", re.M)


def _keys(markdown: str) -> set[str]:
    return set(_KEY_ROW.findall(markdown))


def test_operators_md_is_current():
    from gen_operator_docs import render

    with open(os.path.join(REPO, "OPERATORS.md")) as f:
        committed = f.read()
    rendered = render()
    if committed != rendered:
        ck, rk = _keys(committed), _keys(rendered)
        raise AssertionError(
            "OPERATORS.md is stale — run `python tools/gen_operator_docs.py`"
            " and commit the result.\n"
            f"  committed keys: {len(ck)}  rendered keys: {len(rk)}\n"
            f"  only in committed: {sorted(ck - rk)}\n"
            f"  only in rendered:  {sorted(rk - ck)}\n"
            + (
                "  key sets identical — textual drift only (header counts,"
                " docstring summaries, or oracle marks)"
                if ck == rk
                else ""
            )
        )


def test_registry_integrity_per_module():
    """Registry self-check: every registered key resolves to a loaded
    operator module, no module contributes zero keys, and the per-module
    histogram is printed on failure so a partial-import event (a module
    that registered some keys then failed) is visible as a depressed
    count for exactly one module."""
    from aram_matchdata_etl_spark.registry import all_oracles, all_queries

    queries = all_queries()
    per_module = Counter(
        fn.__module__.rsplit(".", 1)[-1] for fn in queries.values()
    )
    assert all(per_module.values()), f"empty module bucket: {per_module}"
    # Oracles are a subset of queries — an oracle whose query vanished
    # means a module import died between the two registrations.
    orphans = set(all_oracles()) - set(queries)
    assert not orphans, (
        f"oracles without queries (partial module import?): {sorted(orphans)}\n"
        f"per-module key counts: {dict(sorted(per_module.items()))}"
    )
    # Floor, not exact count: new operators only ever ADD keys, so a drop
    # below the committed floor means keys were lost, not that this test
    # needs routine maintenance. Raise the floor when the registry grows.
    assert sum(per_module.values()) >= 371, (
        f"registry shrank below the r7 floor of 371:"
        f" {dict(sorted(per_module.items()))}"
    )
