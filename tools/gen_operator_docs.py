#!/usr/bin/env python
"""Regenerate OPERATORS.md from the live registry: one row per query key
with its oracle status and docstring summary. Run from the repo root:

    python tools/gen_operator_docs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aram_matchdata_etl_spark.registry import all_oracles, all_queries  # noqa: E402


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    return text[:160] + ("…" if len(text) > 160 else "")


def main() -> None:
    queries = all_queries()
    oracles = all_oracles()
    lines = [
        "# OPERATORS — generated registry inventory",
        "",
        f"{len(queries)} query keys; {len(oracles)} DuckDB-oracle-checked, "
        f"{len(queries) - len(oracles)} rows-only (invariant-tested).",
        "Regenerate with `python tools/gen_operator_docs.py`.",
        "",
        "| key | oracle | summary |",
        "|---|---|---|",
    ]
    for name in sorted(queries):
        mark = "duckdb" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first_line(queries[name].__doc__)} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(queries)} operators")


if __name__ == "__main__":
    main()
