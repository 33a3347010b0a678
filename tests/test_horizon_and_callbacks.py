"""Per-horizon feature routing, SaveFeatures callback, non-daily freqs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.callbacks import SaveFeatures
from mlforecast_spark.models import LinearRegression


def test_horizon_feature_templates(spark):
    """Each horizon model reads its own `promo_{h}` column; a perfectly
    informative per-horizon exog must be recovered exactly."""
    rng = np.random.RandomState(0)
    rows = []
    for uid in ["a", "b"]:
        for t in range(50):
            base = float(rng.rand())
            # promo_h literally equals the future target at t+h
            rows.append((uid, t, base, base + 1.0, base + 2.0))
    df = spark.createDataFrame(
        rows, "unique_id string, ds long, y double, promo_1 double, promo_2 double"
    )
    # construct y so that y_{t+h} = promo_h(t): y_t = rand; promo_1(t)=y... need
    # consistency: regenerate with lead relation instead
    # convention: promo_s at row t describes time t+s-1 (the time model step
    # s predicts when the frontier row is t)
    pdf = df.toPandas().sort_values(["unique_id", "ds"])
    pdf["promo_1"] = pdf["y"]
    pdf["promo_2"] = pdf.groupby("unique_id")["y"].shift(-1)
    pdf = pdf.dropna()
    df = spark.createDataFrame(pdf)
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(
        df,
        static_features=[],
        max_horizon=2,
        horizon_feature_templates=["promo_{h}"],
    )
    assert mf.horizon_orders_[0][-1] == "promo_1"
    assert mf.horizon_orders_[1][-1] == "promo_2"
    m0 = mf.models_["LinearRegression"][0]
    # the informative column should carry ~all the weight
    idx = mf.horizon_orders_[0].index("promo_1")
    np.testing.assert_allclose(m0.coef_[idx], 1.0, atol=1e-6)


def test_direct_mode_value_alignment(spark):
    """y_t = t exactly: direct model for step s must predict last + s (would
    catch any off-by-one between lead targets and frontier scoring)."""
    rows = [("a", t, float(t)) for t in range(40)]
    df = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(df, max_horizon=3)
    preds = mf.predict(3).toPandas().sort_values("ds")
    np.testing.assert_allclose(preds["LinearRegression"], [40.0, 41.0, 42.0], atol=1e-6)
    assert preds["ds"].tolist() == [40, 41, 42]


def test_save_features_callback(spark, panel):
    cb = SaveFeatures()
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel)
    mf.predict(3, before_predict_callback=cb).count()
    saved = cb.get_features().toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(saved) == 3 * n_series
    assert "lag1" in saved.columns and "lag7" in saved.columns


@pytest.mark.parametrize("freq,delta_days", [("W", 7), ("MS", None)])
def test_non_daily_freqs(spark, freq, delta_days):
    import datetime

    rows = []
    start = datetime.date(2020, 1, 6)
    for t in range(30):
        if freq == "W":
            d = start + datetime.timedelta(days=7 * t)
        else:
            month = (t % 12) + 1
            year = 2018 + t // 12
            d = datetime.date(year, month, 1)
        rows.append(("a", d, float(t)))
    panel = spark.createDataFrame(rows, "unique_id string, ds date, y double")
    mf = MLForecast(models=[LinearRegression()], freq=freq, lags=[1])
    mf.fit(panel)
    preds = mf.predict(3).toPandas().sort_values("ds")
    ds = pd.to_datetime(preds["ds"])
    if delta_days:
        assert ((ds.diff().dt.days.dropna()) == delta_days).all()
    else:
        assert (ds.dt.day == 1).all()
        assert len(ds.dt.month.unique()) == 3
    # linear trend continues
    np.testing.assert_allclose(
        preds["LinearRegression"].to_numpy(), [30.0, 31.0, 32.0], atol=1e-6
    )
