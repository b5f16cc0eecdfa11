#!/usr/bin/env python
"""Regenerate OPERATORS.md from the live registry: one row per query key
with its oracle status and docstring summary. Run from the repo root:

    python tools/gen_operator_docs.py

`render()` is the single source of truth for the file's content;
tests/test_operator_docs.py asserts the committed file matches it, so a
registry change without a doc regeneration fails the suite instead of
silently rotting the inventory.
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


def render() -> str:
    """The exact OPERATORS.md content for the current registry state."""
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
        mark = "duckdb" if name in all_oracles() else "rows-only"
        lines.append(f"| `{name}` | {mark} | {first_line(queries[name].__doc__)} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md"
    )
    content = render()
    with open(out, "w") as f:
        f.write(content)
    print(f"wrote {out}: {content.count(chr(10)) - 7} operators")


if __name__ == "__main__":
    main()
