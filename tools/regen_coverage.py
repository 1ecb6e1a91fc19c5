"""Regenerate COVERAGE.md's oracle-checked table from the registry's
survey tags (the test-verified table below it is maintained by hand).

Usage: python tools/regen_coverage.py
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402


def main() -> int:
    rows = collections.defaultdict(set)
    for name, spec in registry().items():
        for tag in spec.survey.split():
            rows[tag].add(name)

    def key(tag: str):
        m = re.match(r"([A-Za-z]+)(\d*)", tag)
        return (m.group(1), int(m.group(2) or 0), tag)

    table = ["| SURVEY §2 row | queries exercising it |", "|---|---|"]
    for tag in sorted(rows, key=key):
        table.append(f"| {tag} | {', '.join(sorted(rows[tag]))} |")

    path = REPO / "COVERAGE.md"
    text = path.read_text()
    start = text.index("| SURVEY §2 row | queries exercising it |")
    end = text.index("\n## Test-verified coverage")
    path.write_text(text[:start] + "\n".join(table) + "\n" + text[end:])
    print(f"regenerated: {len(table) - 2} tags over {len(registry())} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
