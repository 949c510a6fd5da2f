"""Versioned snapshot tables: copy-on-write time travel + keyed diffs.

A minimal lakehouse version layer over plain parquet, built the way the
table formats do it (Delta/Iceberg-shaped, from public semantics only):
each commit writes a NEW immutable version directory `v=N/` and then
atomically advances a tiny manifest pointer — readers either see the
old manifest or the new one, never a half-written directory, because
data files are fully written (and `_SUCCESS`-gated) before the pointer
moves. Old versions stay readable (time travel) until vacuumed.

Scale notes: the manifest holds version metadata only (O(versions), not
O(files)); reads are ordinary `spark.read.parquet` on one version
directory, so pushdown/pruning are unchanged. `snapshot_diff` joins two
versions on the primary key and compares a per-row content hash
(operators/validation.py's portable canonical hash — the same digest
the cross-system checksum uses), emitting added/removed/changed rows —
the incremental feed for downstream view maintenance.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_version_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def read_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"current": 0, "versions": []}
    with open(p) as f:
        return json.load(f)


def write_snapshot(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Commit a new version; returns its number. Data first, pointer last."""
    m = read_manifest(table_dir)
    v = m["current"] + 1
    vdir = os.path.join(table_dir, f"v={v}")
    df.write.mode("errorifexists").parquet(vdir)
    m["current"] = v
    m["versions"].append({"version": v, "note": note})
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, _manifest_path(table_dir))  # atomic pointer swap
    return v


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Latest version by default; any retained version for time travel."""
    m = read_manifest(table_dir)
    v = m["current"] if version is None else version
    known = [e["version"] for e in m["versions"]]
    if v not in known:
        raise ValueError(f"version {v} not in manifest (have {known})")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
    canonical_sql: str,
) -> DataFrame:
    """(change, keys...) rows between two versions: 'added' / 'removed' /
    'changed'. Unchanged rows (same key, same content hash) are dropped
    before anything wide moves — the diff shuffles keys+hashes only."""
    from ..operators.text import char_hash_sql

    def hashed(v: int) -> DataFrame:
        df = read_snapshot(spark, table_dir, v)
        return df.select(
            *keys, F.expr(char_hash_sql(canonical_sql)).alias("__rh")
        )

    old = hashed(v_old).alias("o")
    new = hashed(v_new).alias("n")
    cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    j = old.join(new, cond, "full_outer")
    first_new_key = F.col(f"n.{keys[0]}")
    first_old_key = F.col(f"o.{keys[0]}")
    change = (
        F.when(first_old_key.isNull(), F.lit("added"))
        .when(first_new_key.isNull(), F.lit("removed"))
        .when(F.col("o.__rh") != F.col("n.__rh"), F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return (
        j.select(change.alias("change"), *out_keys)
        .filter(F.col("change").isNotNull())
    )


def vacuum_versions(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop data directories of all but the newest keep_last versions
    (manifest entries are retained with a vacuumed flag so history stays
    auditable). Returns the vacuumed version numbers."""
    import shutil

    m = read_manifest(table_dir)
    live = [e for e in m["versions"] if not e.get("vacuumed")]
    to_drop = live[:-keep_last] if keep_last > 0 else live
    # never vacuum the version the manifest's 'current' pointer still
    # references — keep_last=0 would otherwise break every subsequent
    # read_snapshot while the manifest looks healthy
    to_drop = [e for e in to_drop if e["version"] != m["current"]]
    dropped = []
    for e in to_drop:
        vdir = os.path.join(table_dir, f"v={e['version']}")
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        e["vacuumed"] = True
        dropped.append(e["version"])
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, _manifest_path(table_dir))
    return dropped


def snapshot_diff_values(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Keyed diff carrying values: (change, keys..., old_<c>, new_<c>)
    for each value column — the delta feed incremental view maintenance
    consumes. Rows identical in every value column are dropped."""
    old = read_snapshot(spark, table_dir, v_old).alias("o")
    new = read_snapshot(spark, table_dir, v_new).alias("n")
    cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    j = old.join(new, cond, "full_outer")
    first_old = F.col(f"o.{keys[0]}")
    first_new = F.col(f"n.{keys[0]}")
    changed_any = None
    for c in value_cols:
        ne = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed_any = ne if changed_any is None else (changed_any | ne)
    change = (
        F.when(first_old.isNull(), F.lit("added"))
        .when(first_new.isNull(), F.lit("removed"))
        .when(changed_any, F.lit("changed"))
    )
    cols = [change.alias("change")]
    cols += [F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys]
    for c in value_cols:
        cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return j.select(*cols).filter(F.col("change").isNotNull())


def maintain_sum_count(
    prev_agg: DataFrame,
    diff: DataFrame,
    group_col: str,
    old_val: str,
    new_val: str,
) -> DataFrame:
    """Incremental maintenance of a (group, sum_v, n_rows) view from a
    value-carrying snapshot diff — the view is updated from DELTAS
    (O(changed rows)), history is never rescanned. Works exactly on
    integer/decimal value columns; for float measures use the decimal
    pattern upstream (functions/numeric.py).

    delta_sum per group = sum(new - old) with nulls as 0 (an added row
    contributes +new, a removed row -old, a changed row the difference);
    delta_n = +added - removed.

    Contract: group_col must be stable per key across versions (a
    changed row is applied to one group). If the grouping attribute
    itself can change, split such rows into a removed(old group) +
    added(new group) pair before calling.
    """
    d = diff.groupBy(F.col(group_col)).agg(
        F.sum(
            F.coalesce(F.col(new_val), F.lit(0))
            - F.coalesce(F.col(old_val), F.lit(0))
        ).alias("__dsum"),
        F.sum(
            F.when(F.col("change") == "added", 1)
            .when(F.col("change") == "removed", -1)
            .otherwise(0)
        ).alias("__dn"),
    )
    merged = prev_agg.join(d, group_col, "full_outer").select(
        group_col,
        (
            F.coalesce("sum_v", F.lit(0)) + F.coalesce("__dsum", F.lit(0))
        ).alias("sum_v"),
        (
            F.coalesce("n_rows", F.lit(0)) + F.coalesce("__dn", F.lit(0))
        ).alias("n_rows"),
    )
    return merged.filter(F.col("n_rows") > 0)


def stage_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write-audit-publish, step 1: write the data files of the NEXT
    version WITHOUT advancing the manifest pointer. Readers still see
    the current version; the staged directory is invisible to them.
    Returns the staged version number for audit + publish."""
    m = read_manifest(table_dir)
    v = m["current"] + 1
    df.write.mode("errorifexists").parquet(
        os.path.join(table_dir, f"v={v}")
    )
    return v


def read_staged(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Read a staged (unpublished) version for auditing."""
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def publish_snapshot(table_dir: str, version: int, note: str = "") -> None:
    """Write-audit-publish, step 3: atomically advance the pointer to an
    audited staged version. Refuses non-sequential publishes."""
    m = read_manifest(table_dir)
    if version != m["current"] + 1:
        raise ValueError(
            f"cannot publish v{version}: current is v{m['current']}"
        )
    if not os.path.exists(os.path.join(table_dir, f"v={version}", "_SUCCESS")):
        raise ValueError(f"staged v{version} has no _SUCCESS marker")
    m["current"] = version
    m["versions"].append({"version": version, "note": note})
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, _manifest_path(table_dir))


def abort_staged(table_dir: str, version: int) -> None:
    """Drop a staged version that failed its audit. Refuses to touch
    published versions."""
    import shutil

    m = read_manifest(table_dir)
    if any(e["version"] == version for e in m["versions"]):
        raise ValueError(f"v{version} is published; use vacuum_versions")
    vdir = os.path.join(table_dir, f"v={version}")
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
