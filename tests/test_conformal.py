"""Conformal prediction intervals + save/load + transform_exog."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.conformal import PredictionIntervals
from mlforecast_spark.models import LinearRegression


@pytest.mark.parametrize("method", ["conformal_distribution", "conformal_error"])
def test_intervals_shape_and_ordering(spark, panel, method):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, prediction_intervals=PredictionIntervals(n_windows=2, h=5, method=method))
    preds = mf.predict(5, level=[80, 95]).toPandas()
    for col in [
        "LinearRegression-lo-95",
        "LinearRegression-lo-80",
        "LinearRegression-hi-80",
        "LinearRegression-hi-95",
    ]:
        assert col in preds.columns, preds.columns
    assert (preds["LinearRegression-lo-95"] <= preds["LinearRegression-lo-80"]).all()
    assert (preds["LinearRegression-lo-80"] <= preds["LinearRegression-hi-80"]).all()
    assert (preds["LinearRegression-hi-80"] <= preds["LinearRegression-hi-95"]).all()
    # mean within the band
    assert (preds["LinearRegression"] >= preds["LinearRegression-lo-95"]).all()
    assert (preds["LinearRegression"] <= preds["LinearRegression-hi-95"]).all()


def test_conformal_error_quantile_values(spark, panel):
    """lo/hi must equal mean -/+ the exact per-(series, step) |error| quantile."""
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(
        panel,
        prediction_intervals=PredictionIntervals(n_windows=3, h=2, method="conformal_error"),
    )
    cs = mf.cs_df_.toPandas()
    preds = mf.predict(2, level=[90]).toPandas()
    preds = preds.sort_values(["unique_id", "ds"])
    preds["_step"] = preds.groupby("unique_id").cumcount() + 1
    for (uid, step), g in cs.groupby(["unique_id", "_step"]):
        q = np.quantile(g["LinearRegression"].to_numpy(), 0.9)
        row = preds[(preds.unique_id == uid) & (preds._step == step)]
        if len(row) == 0:
            continue
        m = row["LinearRegression"].iloc[0]
        np.testing.assert_allclose(row["LinearRegression-hi-90"].iloc[0], m + q, rtol=1e-9)
        np.testing.assert_allclose(row["LinearRegression-lo-90"].iloc[0], m - q, rtol=1e-9)


def test_predict_level_without_fit_intervals_raises(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    with pytest.raises(ValueError, match="prediction_intervals"):
        mf.predict(2, level=[80]).count()


def test_h_beyond_calibration_raises(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel, prediction_intervals=PredictionIntervals(n_windows=2, h=2))
    with pytest.raises(ValueError, match="exceeds"):
        mf.predict(5, level=[80]).count()


def test_save_load_roundtrip(spark, panel, tmp_path):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel)
    before = mf.predict(3).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    path = str(tmp_path / "model")
    mf.save(path)
    mf2 = MLForecast.load(path, spark)
    after = mf2.predict(3).toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_transform_exog(spark, panel, duck):
    from mlforecast_spark.feature_engineering import transform_exog
    from mlforecast_spark.lag_transforms import RollingMean

    prices = panel.select(
        "unique_id", "ds", (F.col("y") * 2).alias("price")
    )
    out = transform_exog(
        prices, lags=[1], lag_transforms={1: [RollingMean(window_size=3, min_samples=1)]}
    )
    assert set(out.columns) == {
        "unique_id",
        "ds",
        "price",
        "price_lag1",
        "price_rolling_mean_lag1_window_size3_min_samples1",
    }
    pdf = out.toPandas().sort_values(["unique_id", "ds"])
    exp = pdf.groupby("unique_id")["price"].shift(1)
    got = pdf["price_lag1"]
    ok = np.isclose(got, exp) | (got.isna() & exp.isna())
    assert ok.all()
