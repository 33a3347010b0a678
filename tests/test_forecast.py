"""Behavioral tests of the MLForecast pipeline (mirrors the reference's
`tests/test_forecast.py` coverage style)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.lag_transforms import ExpandingMean, RollingMean
from mlforecast_spark.models import LinearRegression, Ridge, SeasonalNaive


def test_fit_predict_shapes(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
        date_features=["dayofweek"],
    )
    mf.fit(panel)
    preds = mf.predict(5).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(preds) == 5 * n_series
    assert set(preds.columns) == {"unique_id", "ds", "LinearRegression"}
    assert preds["LinearRegression"].notna().all()
    # dates continue daily from each series' end
    last = panel.groupBy("unique_id").agg(F.max("ds").alias("last")).toPandas()
    merged = preds.merge(last, on="unique_id")
    steps = (pd.to_datetime(merged["ds"]) - pd.to_datetime(merged["last"])).dt.days
    assert sorted(steps.unique()) == [1, 2, 3, 4, 5]


def test_seasonal_naive_recursion_exact(spark, panel):
    """With SeasonalNaive the recursive loop is exactly predictable:
    step h prediction = y[last - 7 + ((h-1) % 7)] (the sanity model of
    `/root/reference/tests/test_pipeline.py:13-18`)."""
    mf = MLForecast(models=[SeasonalNaive(season_length=7)], freq="D", lags=[7])
    mf.fit(panel)
    preds = mf.predict(9).toPandas()
    hist = panel.toPandas().sort_values(["unique_id", "ds"])
    for uid, g in hist.groupby("unique_id"):
        tail = g["y"].to_numpy()[-7:]
        got = preds[preds.unique_id == uid].sort_values("ds")["SeasonalNaive"].to_numpy()
        exp = np.array([tail[h % 7] for h in range(9)])
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_linear_model_learns_exact_relation(spark):
    """y_t = 2*y_{t-1} exactly -> LinearRegression must recover it and the
    recursive loop must compound it."""
    rows = []
    for uid in ["a", "b"]:
        y = 1.0 if uid == "a" else 3.0
        for t in range(30):
            rows.append((uid, t, y))
            y *= 1.1
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(panel)
    model = mf.models_["LinearRegression"]
    np.testing.assert_allclose(model.coef_, [1.1], rtol=1e-6)
    preds = mf.predict(3).toPandas().sort_values(["unique_id", "ds"])
    hist = panel.toPandas()
    for uid in ["a", "b"]:
        last = hist[hist.unique_id == uid]["y"].iloc[-1]
        exp = [last * 1.1, last * 1.1**2, last * 1.1**3]
        got = preds[preds.unique_id == uid]["LinearRegression"].to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_multiple_models(spark, panel):
    mf = MLForecast(models=[LinearRegression(), Ridge(alpha=10.0)], freq="D", lags=[1, 2])
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    assert {"LinearRegression", "Ridge"} <= set(preds.columns)
    # distinct models must differ (alpha=10 shrinks noticeably)
    assert not np.allclose(preds["LinearRegression"], preds["Ridge"])


def test_direct_mode_matches_horizon_models(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, max_horizon=3)
    assert len(mf.models_["LinearRegression"]) == 3
    preds = mf.predict(3).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(preds) == 3 * n_series


def test_static_features_carried(spark, panel_static):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel_static, static_features=["static_0", "static_1"])
    assert "static_0" in mf.features_order_
    preds = mf.predict(2).toPandas()
    assert preds["LinearRegression"].notna().all()


def test_dynamic_exog_with_x_df(spark, panel):
    from mlforecast_spark.utils import future_grid

    p = panel.withColumn("price", F.rand(7))
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(p, static_features=[])
    assert mf.dynamic_cols_ == ["price"]
    X_df = future_grid(p, "D", 3).withColumn("price", F.lit(0.5))
    preds = mf.predict(3, X_df=X_df).toPandas()
    assert preds["LinearRegression"].notna().all()


def test_cross_validation(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    cv = mf.cross_validation(panel, n_windows=2, h=4).toPandas()
    assert {"unique_id", "ds", "cutoff", "y", "LinearRegression"} == set(cv.columns)
    n_series = panel.select("unique_id").distinct().count()
    assert len(cv) == 2 * 4 * n_series
    # every valid row is within (cutoff, cutoff + 4 days]
    days = (pd.to_datetime(cv["ds"]) - pd.to_datetime(cv["cutoff"])).dt.days
    assert days.between(1, 4).all()


def test_update_appends_and_predicts(spark):
    rows = [("a", t, float(t)) for t in range(20)]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(panel)
    new = spark.createDataFrame([("a", 20, 20.0), ("a", 21, 21.0)], "unique_id string, ds long, y double")
    mf.update(new)
    preds = mf.predict(1).toPandas()
    assert preds["ds"].iloc[0] == 22


def test_make_future_and_missing_future(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    fut = mf.make_future_dataframe(3)
    n_series = panel.select("unique_id").distinct().count()
    assert fut.count() == 3 * n_series
    missing = mf.get_missing_future(3, fut.limit(5))
    assert missing.count() == 3 * n_series - 5


def test_preprocess_dropna_and_keep_last_n(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[7])
    feats = mf.preprocess(panel, dropna=True, keep_last_n=10)
    pdf = feats.toPandas()
    assert pdf["lag7"].notna().all()
    assert (pdf.groupby("unique_id").size() <= 10).all()


def test_predict_subset_ids(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    ids = [r["unique_id"] for r in panel.select("unique_id").distinct().limit(2).collect()]
    preds = mf.predict(2, ids=ids).toPandas()
    assert set(preds["unique_id"]) == set(ids)
