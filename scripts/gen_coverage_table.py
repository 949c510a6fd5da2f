#!/usr/bin/env python3
"""Regenerate the auto-generated query table at the end of COVERAGE.md."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARK = "## Full query inventory (auto-generated from the registry)"


def main() -> None:
    from event_data_etl_gcs_spark.queries import all_queries

    rows = []
    for name, spec in sorted(all_queries().items()):
        doc = " ".join((spec.doc or "").split())
        if len(doc) > 110:
            doc = doc[:107] + "..."
        check = "exact oracle" if spec.oracle else "rows-only"
        rows.append(f"| `{name}` | {check} | {doc} |")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    head = open(path).read().split(MARK)[0]
    with open(path, "w") as f:
        f.write(head + MARK + "\n\n")
        f.write(f"{len(rows)} registered queries.\n\n")
        f.write("| query | check | what it covers |\n|---|---|---|\n")
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} queries to COVERAGE.md")


if __name__ == "__main__":
    main()
