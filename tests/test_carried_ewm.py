"""Carried-EWM predict fast path must reproduce the full-recompute path."""

import numpy as np
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.core import FeaturePlan
from mlforecast_spark.lag_transforms import ExponentiallyWeightedMean, RollingMean
from mlforecast_spark.models import LinearRegression


@pytest.mark.parametrize("lag", [1, 3])
def test_carried_matches_recompute(spark, panel, lag, monkeypatch):
    def build():
        mf = MLForecast(
            models=[LinearRegression()],
            freq="D",
            lags=[1, 7],
            lag_transforms={lag: [ExponentiallyWeightedMean(alpha=0.35), RollingMean(window_size=5, min_samples=1)]},
        )
        mf.fit(panel)
        return mf

    mf_fast = build()
    fast = (
        mf_fast.predict(6, ewm_update_mode="carried")
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )

    mf_slow = build()
    slow = mf_slow.predict(6).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)

    np.testing.assert_allclose(
        fast["LinearRegression"].to_numpy(),
        slow["LinearRegression"].to_numpy(),
        rtol=1e-9,
    )
