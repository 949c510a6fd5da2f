"""MERGE-style upsert as a DataFrame composition (no Delta/Iceberg in
this environment; same anti-join + union shape those formats execute).

``merge_upsert``: rows from `updates` replace target rows with matching
keys; unmatched update rows are inserted; untouched target rows pass
through. One shuffle on the key (the anti join); at table scale this is
exactly what `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT` compiles to, and combined with dynamic partition overwrite
(session.py) only touched partitions get rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """UPSERT semantics: updates win on key collision, everything else
    survives. Columns must match; `updates` must be key-unique."""
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)
