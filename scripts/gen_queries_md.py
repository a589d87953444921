"""Regenerate QUERIES.md from the harness registry docstrings.

Usage: python scripts/gen_queries_md.py  (writes QUERIES.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_in_rust_spark import harness  # noqa: E402

HEADER = """# QUERIES — the driver-harness query catalog

Generated from the `harness.py` registry docstrings. ★ = DuckDB
oracle (hash-checked at sf0.01); ◦ = rows-only by design (quality
bar in pytest).

| query | check | description |
|---|---|---|
"""


def flatten(doc: str | None) -> str:
    if not doc:
        return ""
    return re.sub(r"\s+", " ", doc).strip().replace("|", "\\|")


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = [HEADER]
    for name in sorted(harness.QUERIES):
        mark = "★" if name in harness.ORACLES else "◦"
        doc = flatten(harness.QUERIES[name].__doc__)
        lines.append(f"| `{name}` | {mark} | {doc} |\n")
    lines.append(
        f"\nTotal: {len(harness.QUERIES)} queries, "
        f"{len(harness.ORACLES)} oracle-backed.\n"
    )
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.writelines(lines)
    print(f"wrote QUERIES.md: {len(harness.QUERIES)} queries, "
          f"{len(harness.ORACLES)} oracles")


if __name__ == "__main__":
    main()
