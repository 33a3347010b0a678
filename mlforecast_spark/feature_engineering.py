"""Standalone feature engineering over arbitrary (exogenous) columns.

Mirrors ``transform_exog``
(`/root/reference/mlforecast/feature_engineering.py:15-69`): the same Window
library applied to any value column; feature names are prefixed with the
source column (``price_lag7``, ``price_rolling_mean_lag1_window_size7``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import FeaturePlan, PanelSchema, _parse_transforms
from .utils import qcol


def transform_exog(
    df: DataFrame,
    lags: Optional[Sequence[int]] = None,
    lag_transforms: Optional[dict] = None,
    id_col: str = "unique_id",
    time_col: str = "ds",
) -> DataFrame:
    """Compute lag features over every non-id/time column of ``df``."""
    value_cols = [c for c in df.columns if c not in (id_col, time_col)]
    if not value_cols:
        raise ValueError("df has no value columns to transform")
    out = df
    for col in value_cols:
        registry = _parse_transforms(list(lags or []), lag_transforms or {})
        plan = FeaturePlan(
            schema=PanelSchema(id_col=id_col, time_col=time_col, target_col=col),
            registry=registry,
        )
        with_feats = plan.apply(out)
        renames = {name: f"{col}_{name}" for name in registry}
        out = with_feats.select(
            *[F.col(c) for c in out.columns],
            *[qcol(n).alias(rn) for n, rn in renames.items()],
        )
    return out
