"""OPERATORS.md must track the live registry (VERDICT r6 item 8): the
committed file is regenerated output, and count drift between doc and
registry is the kind of rot that creeps in at 222+ keys. One assertion:
committed bytes == generator output."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_operators_md_is_current():
    from gen_operator_docs import render

    with open(os.path.join(REPO, "OPERATORS.md")) as f:
        committed = f.read()
    assert committed == render(), (
        "OPERATORS.md is stale — run `python tools/gen_operator_docs.py` "
        "and commit the result"
    )
