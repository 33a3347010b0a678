"""cross_validation reference-parity surface: int refit cadence, input_size,
keep_last_n, fitted values, interval pass-through
(`/root/reference/mlforecast/forecast.py:1859-2087`)."""

import numpy as np
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression, SeasonalNaive


def test_int_refit_cadence(spark, panel, monkeypatch):
    """refit=2 over 4 windows fits on windows 0 and 2 only (reference
    `should_fit = i == 0 or (refit > 0 and i % refit == 0)`)."""
    fits = []
    orig_fit = MLForecast.fit

    def spy(self, *a, **k):
        fits.append(1)
        return orig_fit(self, *a, **k)

    monkeypatch.setattr(MLForecast, "fit", spy)
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.cross_validation(panel, n_windows=4, h=3, refit=2).count()
    assert len(fits) == 2

    fits.clear()
    mf2 = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf2.cross_validation(panel, n_windows=3, h=3, refit=False).count()
    assert len(fits) == 1


def test_input_size_trims_train(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    out = mf.cross_validation(panel, n_windows=2, h=3, input_size=20)
    assert out.count() > 0
    # the captured state can hold at most input_size rows per series
    counts = (
        mf.state_.groupBy("unique_id").count().toPandas()["count"]
    )
    assert (counts <= 20).all()


def test_fitted_values_per_window(spark, panel):
    """fitted=True stores each window's in-sample predictions; SeasonalNaive
    makes them closed-form checkable (pred == lag-7 of y)."""
    mf = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
    mf.cross_validation(panel, n_windows=2, h=3, fitted=True).count()
    fv = mf.cross_validation_fitted_values().toPandas()
    assert sorted(fv["fold"].unique()) == [0, 1]
    assert {"unique_id", "ds", "fold", "y", "SeasonalNaive"} <= set(fv.columns)
    f1 = fv[fv["fold"] == 1].sort_values(["unique_id", "ds"])
    g = f1[f1["unique_id"] == f1["unique_id"].iloc[0]]
    y = g["y"].to_numpy()
    pred = g["SeasonalNaive"].to_numpy()
    np.testing.assert_allclose(pred[7:], y[:-7], equal_nan=True)


def test_fitted_requires_flag(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.cross_validation(panel, n_windows=2, h=2).count()
    with pytest.raises(ValueError, match="fitted=True"):
        mf.cross_validation_fitted_values()


def test_level_passthrough_adds_interval_columns(spark, panel):
    from mlforecast_spark.conformal import PredictionIntervals

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    cv = mf.cross_validation(
        panel,
        n_windows=2,
        h=2,
        prediction_intervals=PredictionIntervals(n_windows=2, h=2),
        level=[80],
    ).toPandas()
    assert any(c.endswith("lo-80") for c in cv.columns)
    assert any(c.endswith("hi-80") for c in cv.columns)
