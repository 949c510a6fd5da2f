"""Deduplication operators (SURVEY.md Phase 4 north star): exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first design:
  * Exact dedup = hash groupBy (one shuffle on the content key, map-side
    partial aggregation).
  * MinHash signatures and SimHash are map-only column expressions over
    the portable polynomial hashes in operators.text — no shuffle until
    the candidate join.
  * LSH candidate generation = self-equi-join on (band_id, band_hash):
    Catalyst plans a shuffle hash / sort-merge join on the band key, which
    is exactly the "bucket join" an LSH index does at scale; band keys
    spread uniformly so skew is bounded.
  * Verification (exact Jaccard on shingle sets) happens only on
    candidate pairs — the quadratic step never touches the full corpus.

All integer arithmetic -> every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (
    HASH_P,
    duck_shingle_hashes,
    duck_shingles,
    duck_tokens,
    shingle_hashes_sql,
    shingles_sql,
    tokens_sql,
)

# Fixed MinHash parameters: h_j(x) = (A[j] * x + B[j]) mod HASH_P.
# Constants are arbitrary odd numbers < HASH_P, pinned for reproducibility.
MINHASH_A = (452930477, 949121103, 260933191, 577932821, 383339053, 823987307, 144066163, 674525495)
MINHASH_B = (83173903, 274582805, 592314181, 430183029, 721549031, 131159933, 936523877, 357151253)
N_HASHES = 8
N_BANDS = 4  # 2 rows per band -> candidate if any band matches


def minhash_signature_sql(hash_col: str, j: int) -> str:
    """Spark SQL: j-th MinHash of a shingle-hash-array column; empty set -> HASH_P
    (sentinel larger than any real hash, so empty docs never collide)."""
    a, b = MINHASH_A[j], MINHASH_B[j]
    return (
        f"CASE WHEN size({hash_col}) = 0 THEN {HASH_P}L ELSE "
        f"array_min(transform({hash_col}, h -> (h * {a} + {b}) % {HASH_P})) END"
    )


def duck_minhash_signature(hash_col: str, j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return (
        f"CASE WHEN len({hash_col}) = 0 THEN CAST({HASH_P} AS BIGINT) ELSE "
        f"list_min(list_transform({hash_col}, h -> (h * {a} + {b}) % {HASH_P})) END"
    )


def with_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds mh_0..mh_{N-1} MinHash signature columns (map-only)."""
    out = (
        df.withColumn("toks", F.expr(tokens_sql(text_col)))
        .withColumn("shingles", F.expr(shingles_sql("toks")))
        .withColumn("sh_hashes", F.expr(shingle_hashes_sql("shingles")))
    )
    for j in range(N_HASHES):
        out = out.withColumn(f"mh_{j}", F.expr(minhash_signature_sql("sh_hashes", j)))
    return out.drop("toks", "shingles")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Jaccard is exact on distinct shingle-hash sets, computed only for
    band-collision candidates.
    """
    sig = (
        with_minhash(df, text_col)
        # docs with no shingles (<3 tokens) all share the sentinel
        # signature and would cross-collide; they can't be near-dups.
        .filter(F.expr("size(sh_hashes) > 0"))
        .select(
            F.col(id_col).alias("id"),
            "sh_hashes",
            *[f"mh_{j}" for j in range(N_HASHES)],
        )
    )
    rows_per_band = N_HASHES // N_BANDS
    # band key = struct of the band's signature rows; explode to (band_id, key)
    bands = []
    for b in range(N_BANDS):
        cols = [
            F.col(f"mh_{b * rows_per_band + r}").alias(f"k{r}")
            for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.struct(*cols).alias("key"))
        )
    exploded = sig.select(
        "id", "sh_hashes", F.explode(F.array(*bands)).alias("band")
    ).select("id", "sh_hashes", F.col("band.band_id").alias("band_id"), F.col("band.key").alias("key"))

    left = exploded.alias("a")
    right = exploded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_hashes").alias("ha"),
            F.col("b.sh_hashes").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = cand.withColumn(
        "jaccard",
        F.when(
            F.expr("size(array_union(ha, hb))") == 0, F.lit(0.0)
        ).otherwise(
            F.expr("size(array_intersect(ha, hb))").cast("double")
            / F.expr("size(array_union(ha, hb))")
        ),
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def duck_minhash_lsh_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> str:
    """DuckDB oracle for minhash_lsh_pairs — same constants, same math."""
    toks = duck_tokens(text_col)
    rows_per_band = N_HASHES // N_BANDS
    mh_cols = ", ".join(
        f"{duck_minhash_signature('sh_hashes', j)} AS mh_{j}" for j in range(N_HASHES)
    )
    band_rows = " UNION ALL ".join(
        "SELECT id, sh_hashes, {b} AS band_id, [{keys}] AS key FROM sig".format(
            b=b,
            keys=", ".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS toks, {text_col} AS text FROM {table}
), sh AS (
  SELECT id, {duck_shingles('toks')} AS shingles FROM base
), hashed AS (
  SELECT id, {duck_shingle_hashes('shingles')} AS sh_hashes FROM sh
), sig AS (
  SELECT id, sh_hashes, {mh_cols} FROM hashed WHERE len(sh_hashes) > 0
), bands AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         any_value(a.sh_hashes) AS ha, any_value(b.sh_hashes) AS hb
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.key = b.key AND a.id < b.id
  GROUP BY a.id, b.id
), jac AS (
  SELECT id_a, id_b,
    CASE WHEN len(list_distinct(list_concat(ha, hb))) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(ha, hb)) AS DOUBLE)
              / len(list_distinct(list_concat(ha, hb))) END AS jaccard
  FROM cand
)
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_sql(token_hash_col: str) -> str:
    """Spark SQL: 32-bit SimHash of a token-hash-array column.

    bit b set iff sum over tokens of (+1 if bit b of token hash else -1) > 0.
    """
    return (
        f"aggregate(transform(sequence(0, {SIMHASH_BITS - 1}), b -> "
        f"CASE WHEN aggregate({token_hash_col}, 0L, "
        f"(acc, h) -> acc + CASE WHEN (h div shiftleft(1L, b)) % 2 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        f"0L, (acc, x) -> acc + x)"
    )


def duck_simhash(token_hash_col: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(0, {SIMHASH_BITS}), b -> "
        f"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), {token_hash_col}), "
        f"(acc, h) -> acc + CASE WHEN (h // (CAST(1 AS BIGINT) << b)) % 2 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)), "
        f"(acc, x) -> acc + x)"
    )


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds simhash + two 16-bit half-band columns (candidate blocking
    keys: near-dups at hamming distance <= ~2 usually share a half)."""
    from .text import token_hashes_sql

    out = (
        df.withColumn("toks", F.expr(tokens_sql(text_col)))
        .withColumn("tok_hashes", F.expr(token_hashes_sql("toks")))
        .withColumn("simhash", F.expr(simhash_sql("tok_hashes")))
        .withColumn("band_lo", F.expr("simhash % 65536").cast("long"))
        .withColumn("band_hi", F.expr("simhash div 65536").cast("long"))
    )
    return out.drop("toks", "tok_hashes")
