"""Parquet footer statistics — the ANALYZE-style metadata surface.

Row counts and per-column min/max straight from parquet footers (no data
read): the information a planner, a Z-order verifier, or an operator
sizing a broadcast needs, at metadata cost. At 100 TB this is the
difference between statting footers and scanning rows — footer reads are
O(files), not O(bytes).

Pure pyarrow; no SparkSession required (usable from a driver-side
planning step or an ops notebook against the same lake paths).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class RowGroupStats:
    file: str
    row_group: int
    n_rows: int
    # column -> (min, max); absent when the writer emitted no stats
    ranges: dict[str, tuple[object, object]]


def iter_row_group_stats(table_dir: str, columns: list[str] | None = None):
    """Yield RowGroupStats for every row group under table_dir
    (hive-partitioned layouts included — partition key columns are not
    in the footer; derive them from the path if needed)."""
    import pyarrow.parquet as pq

    pattern = os.path.join(table_dir, "**", "*.parquet")
    for path in sorted(glob.glob(pattern, recursive=True)):
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            ranges: dict[str, tuple[object, object]] = {}
            for i, name in enumerate(names):
                if columns is not None and name not in columns:
                    continue
                st = g.column(i).statistics
                if st is not None and st.has_min_max:
                    ranges[name] = (st.min, st.max)
            yield RowGroupStats(path, rg, g.num_rows, ranges)


def table_row_count(table_dir: str) -> int:
    """Exact row count from footers alone."""
    return sum(s.n_rows for s in iter_row_group_stats(table_dir, columns=[]))


def column_range(table_dir: str, column: str) -> tuple[object, object] | None:
    """Global (min, max) of a column from footer stats; None when any
    row group lacks stats (the caller must not assume a range then)."""
    lo = hi = None
    for s in iter_row_group_stats(table_dir, columns=[column]):
        if column not in s.ranges:
            return None
        mn, mx = s.ranges[column]
        lo = mn if lo is None or mn < lo else lo
        hi = mx if hi is None or mx > hi else hi
    return None if lo is None else (lo, hi)


def prunable_fraction(
    table_dir: str, column: str, lo: object, hi: object
) -> float:
    """Fraction of ROWS a stats-pruning scan skips for the range
    predicate `lo <= column <= hi` — the deterministic form of the
    clustered-layout benefit (SCALE_100x.md measures it for Z-order).
    Row groups without stats count as unprunable (they must be read)."""
    total = skipped = 0
    for s in iter_row_group_stats(table_dir, columns=[column]):
        total += s.n_rows
        rng = s.ranges.get(column)
        if rng is not None and (rng[1] < lo or rng[0] > hi):
            skipped += s.n_rows
    return skipped / total if total else 0.0
