"""In-flight data-quality metrics via ``DataFrame.observe``.

The Observation API attaches named aggregate metrics to a plan node;
they are computed AS A SIDE EFFECT of whatever action already runs —
zero extra scans, zero extra shuffles — and read on the driver after
the action. At 100 TB this is the difference between "write the table,
then rescan it to validate" and "the write itself reports row count,
null rates and value bounds".

Streaming equivalent: the same `.observe` on a streaming DataFrame
surfaces per-micro-batch metrics through
``StreamingQueryListener``/``lastProgress["observedMetrics"]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_observation(
    df: DataFrame,
    name: str = "quality",
    null_cols: tuple[str, ...] = (),
    bound_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach (n_rows, null_<c> per requested column, min/max of
    bound_col) as observed metrics. Returns (df, observation); read
    ``observation.get`` AFTER an action has run on the returned df."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    if bound_col is not None:
        metrics.append(F.min(bound_col).alias(f"min_{bound_col}"))
        metrics.append(F.max(bound_col).alias(f"max_{bound_col}"))
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    min_rows: int = 1,
    max_null_frac: float = 0.0,
) -> dict:
    """Gate on the observed metrics (call after the action). Returns the
    metrics dict on success; raises with the metrics in the message on
    violation — the cheap post-write contract check."""
    m = observation.get
    n = m["n_rows"]
    if n < min_rows:
        raise AssertionError(f"quality gate: {n} rows < {min_rows} ({m})")
    for k, v in m.items():
        if k.startswith("null_") and n and v / n > max_null_frac:
            raise AssertionError(
                f"quality gate: {k}={v}/{n} exceeds {max_null_frac} ({m})"
            )
    return m
