"""Distributed Bloom-filter build + membership probe, pure DataFrame ops.

Spark's own runtime bloom filter (``spark.sql.optimizer.runtime.bloomFilter``,
asserted in tests/test_scale_techniques2.py) is planner-internal, and the
``bloom_filter_agg`` expression is not registered as a public function on a
vanilla Spark 4.1 session — so a *user-facing* membership filter needs its
own operator. This one is built so it scales and so it has an exact DuckDB
oracle:

- **Build** (one shuffle, tiny output): each build key emits K bit
  positions; ``groupBy(word) -> bit_or(mask)`` collapses them into an
  ``m_bits/WORD_BITS``-row word table with map-side partial aggregation.
  The word table is then folded into a ONE-ROW dense ``array<bigint>``.
- **Probe** (map-only): the one-row array is broadcast-cross-joined onto
  the probe side; the membership test is a native ``forall`` over the K
  positions — no shuffle of the probe side, no Python. At 100 TB the
  probe is embarrassingly parallel and the only data movement is the
  ~``m_bits/WORD_BITS`` longs of the filter itself.

Portability: hashes are affine transforms of the key modulo a prime
(< 2^31), with every multiplication explicitly CAST to BIGINT — Spark
(non-ANSI) silently wraps int overflow while DuckDB raises, so mixed-type
arithmetic must never overflow INT32 on either engine. Words hold 30 bits
so every mask stays a small positive BIGINT (no sign-bit / shift-overflow
divergence between engines).

Reference parity: the reference engine has no bloom operator; this is part
of the beyond-reference training-pipeline surface (SURVEY.md Phase 4), in
the family of membership/decontamination gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_P = 1_000_000_007  # prime < 2^30: affine hash stays exact in int64
WORD_BITS = 30  # masks <= 2^29: positive, shift-safe in both engines

# Fixed affine hash parameters (k = 5): primes, pinned for determinism.
_A = (1_299_721, 1_299_743, 1_299_763, 1_299_791, 1_299_811)
_B = (15_485_863, 32_452_843, 49_979_687, 67_867_967, 86_028_121)
N_HASHES = len(_A)


def _positions_exprs(key_sql: str, m_bits: int) -> list[str]:
    """K bit-position expressions for an integer key expression.

    Portable SQL (valid in Spark and DuckDB): explicit BIGINT casts keep
    every intermediate exact on both engines.
    """
    key = f"(CAST({key_sql} AS BIGINT) % {BLOOM_P})"
    return [
        f"((CAST({a} AS BIGINT) * {key} + {b}) % {BLOOM_P}) % {m_bits}"
        for a, b in zip(_A, _B)
    ]


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 61_440) -> DataFrame:
    """Collapse ``df[key_col]`` (integer-typed) into a one-row Bloom filter.

    Returns a single-row DataFrame ``(bloom: array<bigint>, m_bits: int)``
    where ``bloom[w]`` (0-indexed word) holds WORD_BITS bits. Shuffle cost:
    one partial-aggregated exchange of at most ``m_bits/WORD_BITS`` words.
    """
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    n_words = m_bits // WORD_BITS
    pos_array = "array(" + ", ".join(_positions_exprs(key_col, m_bits)) + ")"
    words = (
        df.select(F.explode(F.expr(pos_array)).alias("pos"))
        .select(
            F.expr(f"CAST(pos DIV {WORD_BITS} AS INT)").alias("word"),
            F.expr(f"CAST(shiftleft(1L, CAST(pos % {WORD_BITS} AS INT)) AS BIGINT)").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    # Dense one-row array: word -> bits map (agg), then gap-fill with 0 in
    # a separate projection (aggregates can't sit inside a lambda body).
    onerow = words.groupBy().agg(
        F.expr("map_from_entries(collect_list(struct(word, bits)))").alias("wm")
    )
    return onerow.select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), w -> coalesce(element_at(wm, w), 0L))"
        ).alias("bloom"),
        F.lit(m_bits).alias("m_bits"),
    )


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 61_440,
    out: str = "might_contain",
) -> DataFrame:
    """Map-only membership probe: broadcast the one-row filter, test K bits.

    No false negatives by construction; false positives bounded by the
    usual (1 - e^{-kn/m})^k. The probe side is never shuffled.
    """
    pos_list = ", ".join(_positions_exprs(key_col, m_bits))
    test = (
        f"forall(array({pos_list}), p -> "
        f"(element_at(bloom, CAST(p DIV {WORD_BITS} AS INT) + 1) & "
        f"shiftleft(1L, CAST(p % {WORD_BITS} AS INT))) != 0)"
    )
    return (
        probe.crossJoin(F.broadcast(bloom.select("bloom")))
        .withColumn(out, F.expr(test))
        .drop("bloom")
    )


def duck_bloom_ctes(
    build_from: str, build_key: str, m_bits: int = 61_440
) -> str:
    """DuckDB CTEs reproducing the build: ``bloom_words(word, bits)``.

    ``build_from`` is a FROM-clause fragment (table + optional WHERE).
    """
    pos_exprs = _positions_exprs(build_key, m_bits)
    return (
        f"bloom_pos AS (SELECT DISTINCT unnest([{', '.join(pos_exprs)}]) AS pos "
        f"FROM {build_from}), "
        f"bloom_words AS (SELECT CAST(pos // {WORD_BITS} AS INT) AS word, "
        f"bit_or(CAST(1::BIGINT << CAST(pos % {WORD_BITS} AS INT) AS BIGINT)) AS bits "
        f"FROM bloom_pos GROUP BY 1)"
    )


def duck_bloom_probe_select(
    probe_from: str, probe_key: str, m_bits: int = 61_440
) -> str:
    """DuckDB SELECT yielding ``(k, might_contain)`` per probe row, given
    ``bloom_words`` from :func:`duck_bloom_ctes` is in scope. The relational
    form (unnest positions, LEFT JOIN words, bool_and) is equivalent to
    the broadcast-array form Spark executes."""
    pos_exprs = _positions_exprs("k", m_bits)
    return (
        f"SELECT k, bool_and(coalesce("
        f"(w.bits & CAST(1::BIGINT << CAST(pp.pos % {WORD_BITS} AS INT) AS BIGINT)) <> 0, "
        f"false)) AS might_contain "
        f"FROM (SELECT k, unnest([{', '.join(pos_exprs)}]) AS pos "
        f"FROM (SELECT {probe_key} AS k FROM {probe_from})) pp "
        f"LEFT JOIN bloom_words w ON w.word = CAST(pp.pos // {WORD_BITS} AS INT) "
        f"GROUP BY k"
    )
