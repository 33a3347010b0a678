"""Weighted conformal intervals + the IRLS logistic density-ratio estimator."""

import numpy as np
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.conformal import PredictionIntervals
from mlforecast_spark.models import LinearRegression, LogisticRegression


def test_logistic_regression_irls(spark):
    rng = np.random.RandomState(0)
    X = rng.randn(4000, 3)
    logit = 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.5
    y = (rng.rand(4000) < 1 / (1 + np.exp(-logit))).astype("float64")
    # driver-side IRLS
    clf = LogisticRegression()
    clf.fit(X, y)
    np.testing.assert_allclose(clf.coef_, [1.5, -2.0, 0.0], atol=0.25)
    np.testing.assert_allclose(clf.intercept_, 0.5, atol=0.2)
    # distributed IRLS must match
    rows = [(float(y[i]), *[float(v) for v in X[i]]) for i in range(4000)]
    df = spark.createDataFrame(rows, "lbl double, f0 double, f1 double, f2 double")
    clf2 = LogisticRegression()
    clf2.fit_spark(df, ["f0", "f1", "f2"], "lbl")
    np.testing.assert_allclose(clf2.coef_, clf.coef_, atol=1e-6)
    np.testing.assert_allclose(clf2.intercept_, clf.intercept_, atol=1e-6)


@pytest.mark.parametrize(
    "method", ["weighted_conformal_error", "weighted_conformal_distribution"]
)
def test_weighted_intervals(spark, panel, method):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(
        panel,
        prediction_intervals=PredictionIntervals(n_windows=3, h=3, method=method),
    )
    assert "_w" in mf.cs_df_.columns
    ws = mf.cs_df_.select("_w").toPandas()["_w"]
    assert (ws > 0).all() and ws.notna().all()
    preds = mf.predict(3, level=[80]).toPandas()
    lo, hi = "LinearRegression-lo-80", "LinearRegression-hi-80"
    assert lo in preds.columns and hi in preds.columns
    assert (preds[lo] <= preds[hi]).all()
    assert preds[[lo, hi]].notna().all().all()
