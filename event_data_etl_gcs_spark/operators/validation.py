"""Cross-system table-content validation: orderless partition checksums.

The migration/replication check a 100 TB lake needs: after copying or
re-encoding a table (engine swap, format rewrite, repartition), prove
byte-level content equality per partition WITHOUT sorting either side —
a sum of per-row hashes is order- and partitioning-invariant, so two
systems can each compute their side map-only and compare k rows of
digests.

Two channels harden it: checksum = sum(h) mod P catches any value
change; checksum2 = sum(h^2 mod P) mod P catches compensating edits
that preserve the plain sum (swap h_i+d, h_j-d). Mod-reduction keeps
every intermediate in exact integer range at any row count (the
per-partition partial sums are DECIMAL(38,0), exact and associative).

The row hash is the repo's portable polynomial char hash over a
canonical row rendering — deliberately engine-neutral so a DuckDB /
Trino / Spark pair can all produce it. Canonical-rendering rules (the
part that actually bites in practice):
  * doubles with known 2-decimal semantics render via DECIMAL(12,2)
    (double->string formatting is NOT portable across engines);
  * timestamps render as epoch microseconds (fraction-trimming rules
    differ across engines);
  * NULL renders as chr(2), distinct from the empty string, and fields
    join on chr(31) so no string value can alias a field boundary.
In a Spark-only deployment swap the char hash for xxhash64() — faster,
same contract; the polynomial form is the cross-engine-verifiable mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import HASH_P, char_hash_sql, duck_char_hash

NULL_MARK = "chr(2)"
FIELD_SEP = "chr(31)"


def canonical_row_sql(fields: list[str]) -> str:
    """concat_ws over canonicalized field renderings — identical syntax
    in Spark SQL and DuckDB. Pass each field already rendered to string
    (see module docstring for the portable renderings)."""
    parts = ", ".join(f"COALESCE({f}, {NULL_MARK})" for f in fields)
    return f"concat_ws({FIELD_SEP}, {parts})"


def checksum_agg_cols(hash_col: str = "__rh") -> list[Column]:
    """The three digest aggregates over a row-hash column."""
    h = F.col(hash_col)
    big = "decimal(38,0)"
    return [
        F.count("*").cast("long").alias("n_rows"),
        (F.sum(h.cast(big)) % F.lit(HASH_P).cast(big))
        .cast("long")
        .alias("checksum"),
        (F.sum(((h * h) % HASH_P).cast(big)) % F.lit(HASH_P).cast(big))
        .cast("long")
        .alias("checksum2"),
    ]


def duck_checksum_select(hash_expr: str) -> str:
    """DuckDB rendering of the digest aggregates over a hash expression."""
    return (
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum({hash_expr}) % {HASH_P} AS BIGINT) AS checksum, "
        f"CAST(sum(({hash_expr} * {hash_expr}) % {HASH_P}) % {HASH_P} "
        "AS BIGINT) AS checksum2"
    )


def partition_checksums(
    df: DataFrame, part_expr: str, canonical_sql: str
) -> DataFrame:
    """(part, n_rows, checksum, checksum2) per partition value.

    Map-only hash + one groupBy on the partition key; digests are
    mergeable (sums mod P), so re-partitioned recomputation combines."""
    rh = F.expr(char_hash_sql(canonical_sql))
    return (
        df.select(F.expr(part_expr).alias("part"), rh.alias("__rh"))
        .groupBy("part")
        .agg(*checksum_agg_cols())
    )
