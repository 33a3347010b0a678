"""LightGBMCV-analog: staged boosting with early stopping over CV windows."""

import numpy as np
import pytest

from mlforecast_spark.lgb_cv import LightGBMCV


def test_lgb_cv_staged_training(spark, panel):
    cv = LightGBMCV(freq="D", lags=[1, 7], params={"max_depth": 3})
    hist = cv.fit(panel, n_windows=2, h=3, num_iterations=30, eval_every=10)
    assert len(hist) >= 1
    assert cv.best_score_ == min(hist)
    assert cv.best_iteration_ % 10 == 0 and cv.best_iteration_ >= 10
    mf = cv.to_mlforecast()
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(preds) == 3 * n_series
    assert preds["GradientBoostedTrees"].notna().all()


def test_lgb_cv_cogroup_scoring_matches(spark, panel):
    """predict_engine='cogroup' must reproduce the loop engine's staged
    metric history exactly (same boosters, engine-equal rollouts)."""
    import numpy as np

    def run(engine):
        cv = LightGBMCV(
            freq="D", lags=[1, 7], params={"max_depth": 3},
            predict_engine=engine,
        )
        return cv.fit(panel, n_windows=2, h=3, num_iterations=20, eval_every=10)

    np.testing.assert_allclose(run("spark"), run("cogroup"), rtol=1e-8)


def test_from_cv_classmethod(spark, panel):
    """Reference surface MLForecast.from_cv(cv) == cv.to_mlforecast()."""
    from mlforecast_spark import MLForecast

    cv = LightGBMCV(freq="D", lags=[1, 7], params={"max_depth": 3})
    with pytest.raises(ValueError, match="fitted"):
        MLForecast.from_cv(cv)
    cv.fit(panel, n_windows=2, h=3, num_iterations=10, eval_every=10)
    mf = MLForecast.from_cv(cv)
    mf.fit(panel)
    assert mf.predict(2).count() > 0
