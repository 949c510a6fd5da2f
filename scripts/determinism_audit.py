#!/usr/bin/env python3
"""Determinism audit: every registered query must produce BIT-IDENTICAL
results regardless of parallelism. Each query runs under
spark.sql.shuffle.partitions=32 and =4 (different partition counts →
different aggregation/join orders wherever the engine is allowed to
vary them) and the canonicalized result hashes must match.

This is the local stand-in for "local[1] == 1000 executors": the
decimal-sum / order-pinned-fold / integer-hash disciplines are exactly
what makes these hashes stable, and a regression here is what would
show up as a driver hash flake.

Output: DETERMINISM.md at the repo root.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("DETERMINISM_SF", "/root/testdata/sf0.001")


def _cell(v) -> str:
    if isinstance(v, float):
        return v.hex()  # bit-exact
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if hasattr(v, "asDict"):  # nested Row
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.asDict().items())) + "}"
    return repr(v)


def result_hash(df) -> str:
    rows = sorted("|".join(_cell(v) for v in r) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="determinism-audit")
    specs = all_queries()
    hashes: dict[str, dict[int, str]] = {}
    for parts in (32, 4):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for name, spec in specs.items():
            try:
                h = result_hash(spec.fn(spark, SF))
            except Exception as exc:  # pragma: no cover - audit robustness
                h = f"ERROR:{type(exc).__name__}"
            hashes.setdefault(name, {})[parts] = h
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    # Documented exceptions: iterative float algorithms whose
    # cross-partition double sums are last-ulp partitioning-dependent BY
    # CONSTRUCTION (registered rows-only, verified against independent
    # references in pytest instead). graph_pagerank left this set in
    # round 10: the registered query is now the scaled-integer form
    # (operators/graph.pagerank_quantized) — partitioning-independent
    # with an exact unrolled-CTE oracle.
    EXPECTED_FLOAT_ITERATIVE = {"kmeans_iterated"}
    diffs = {n: hs for n, hs in hashes.items() if len(set(hs.values())) != 1}
    expected = {n: hs for n, hs in diffs.items() if n in EXPECTED_FLOAT_ITERATIVE}
    mismatches = {n: hs for n, hs in diffs.items() if n not in EXPECTED_FLOAT_ITERATIVE}
    lines = [
        "# DETERMINISM — parallelism-independence audit",
        "",
        f"Every registered query ({len(specs)}) run at {SF} under",
        "`spark.sql.shuffle.partitions` 32 and 4; canonical result hashes",
        "(floats as bit-exact hex) must match. Regenerate:",
        "`python scripts/determinism_audit.py`.",
        "",
        f"**{len(specs) - len(diffs)}/{len(specs)} queries bit-identical across partitionings"
        + (
            f" ({len(expected)} documented float-iterative exception"
            + ("s" if len(expected) != 1 else "")
            + ": "
            + ", ".join(f"`{n}`" for n in sorted(expected))
            + " — rows-only by design, pytest-verified against numpy).**"
            if expected
            else ".**"
        ),
        "",
    ]
    if mismatches:
        lines += ["| query | hash@32 | hash@4 |", "|---|---|---|"]
        for n, hs in sorted(mismatches.items()):
            lines.append(f"| `{n}` | {hs[32]} | {hs[4]} |")
    else:
        lines.append("No mismatches.")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DETERMINISM.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
