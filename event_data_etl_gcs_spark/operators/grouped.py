"""Grouped-map operators: applyInPandas — per-group pandas DataFrame in,
DataFrame out. The escape hatch for per-entity logic that needs the whole
group in memory (per-user model fitting, group-local normalization,
sequence featurization). Groups must fit in executor memory — the
operator contract at 100 TB is 'many small groups', which the shuffle on
the group key delivers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def per_group_zscore(
    df: DataFrame,
    key: str,
    value_col: str,
    row_col: str = "row_id",
    out_col: str = "zscore",
) -> DataFrame:
    """Group-local standardization (x - mean)/std per key; std==0 or
    single-row groups yield 0.0. Equivalent to the window formulation but
    demonstrates the grouped-map path for logic windows can't express."""
    schema = f"{key} long, {row_col} long, {out_col} double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std and std > 0 else v * 0.0
        return pd.DataFrame(
            {key: pdf[key], row_col: pdf[row_col], out_col: z}
        )

    return df.groupBy(key).applyInPandas(standardize, schema=schema)
