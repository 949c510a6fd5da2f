"""Numeric helpers for oracle-exact aggregation.

Floating-point sums are order-dependent; Spark's partial aggregation order
differs from any single-threaded oracle, so ``SUM(double)`` is not
bit-reproducible. For correctness-gated aggregates we sum in DECIMAL
(exact, associative) and cast the final value to double — bit-identical
regardless of partitioning, and expressible verbatim in the DuckDB oracle:
``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.

Bench-path queries are free to use plain double sums; this is about
deterministic answers, which a 1000-executor run needs anyway if its
outputs feed golden checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Order-insensitive SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Order-insensitive AVG: exact decimal sum divided by count, in
    double — identical in Spark and DuckDB for the same rows."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def exact_sum_disc_price(price: str, disc: str) -> Column:
    """Order-insensitive SUM(price * (1 - disc)) with both inputs cast to
    decimal *before* the multiply. Casting the double product to a
    high-scale decimal is NOT portable (DuckDB converts via double
    multiplication and rounds differently); casting 2-decimal inputs is
    unambiguous in both engines."""
    p = F.col(price).cast("decimal(18,2)")
    d = F.col(disc).cast("decimal(18,2)")
    return F.sum(p * (F.lit(1).cast("decimal(18,2)") - d)).cast("double")


def sql_exact_sum_disc_price(price: str, disc: str) -> str:
    return (
        f"CAST(SUM(CAST({price} AS DECIMAL(18,2)) * "
        f"(CAST(1 AS DECIMAL(18,2)) - CAST({disc} AS DECIMAL(18,2)))) AS DOUBLE)"
    )


def sql_exact_sum(expr: str, scale: int = 2, precision: int = 38) -> str:
    """DuckDB-side rendering of exact_sum for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 2, precision: int = 38) -> str:
    return f"({sql_exact_sum(expr, scale, precision)} / COUNT({expr}))"
