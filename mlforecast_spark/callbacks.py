"""Prediction callbacks (`/root/reference/mlforecast/callbacks.py:12-43`).

Callbacks are driver-side hooks around each recursive step's frontier frame:
``before_predict_callback(features_df) -> features_df`` and
``after_predict_callback(scored_df) -> scored_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SaveFeatures:
    """Collects each prediction step's feature frame for inspection
    (`/root/reference/mlforecast/callbacks.py` SaveFeatures)."""

    def __init__(self):
        self._frames: list[DataFrame] = []

    def __call__(self, df: DataFrame) -> DataFrame:
        # cache so the later union doesn't recompute a frame whose inputs
        # (the mutable recursive state) have moved on
        df = df.cache()
        self._frames.append(df)
        return df

    def get_features(self) -> DataFrame:
        if not self._frames:
            raise ValueError("No features were saved; run predict first.")
        from functools import reduce

        return reduce(DataFrame.unionByName, self._frames)
