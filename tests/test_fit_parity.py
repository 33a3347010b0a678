"""fit() reference-parity surface: sparse direct horizons, per-model fit
kwargs, validate_data, cache_train_df
(`/root/reference/mlforecast/forecast.py:1122-1142`)."""

import numpy as np
import pandas as pd
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression


def test_sparse_horizons_train_only_requested(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, horizons=[2, 4])
    assert mf.max_horizon_ == 4
    assert mf.trained_horizons_ == [2, 4]
    per_h = mf.models_["LinearRegression"]
    assert per_h[0] is None and per_h[2] is None
    assert per_h[1] is not None and per_h[3] is not None

    out = mf.predict(4, horizons=[2, 4]).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(out) == 2 * n_series
    with pytest.raises(ValueError, match="was not trained"):
        mf.predict(4).count()


def test_sparse_equals_dense_on_trained_steps(spark, panel):
    key = ["unique_id", "ds"]
    sparse = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    sparse.fit(panel, horizons=[2, 4])
    a = sparse.predict(4, horizons=[2, 4]).toPandas().sort_values(key)
    dense = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    dense.fit(panel, max_horizon=4)
    b = dense.predict(4, horizons=[2, 4]).toPandas().sort_values(key)
    np.testing.assert_allclose(
        a["LinearRegression"].to_numpy(),
        b["LinearRegression"].to_numpy(),
        rtol=1e-9,
    )


def test_validate_data_rejects_duplicates(spark):
    bad = pd.DataFrame(
        {
            "unique_id": ["a"] * 3,
            "ds": pd.to_datetime(["2020-01-01", "2020-01-01", "2020-01-02"]),
            "y": [1.0, 2.0, 3.0],
        }
    )
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    with pytest.raises(ValueError, match="Invalid panel"):
        mf.fit(spark.createDataFrame(bad), validate_data=True)


def test_models_fit_kwargs_reach_trainer(spark, panel):
    calls = {}

    class Spy(LinearRegression):
        def fit_spark(self, df, cols, target, sample_frac=None):
            calls["sample_frac"] = sample_frac
            return super().fit_spark(df, cols, target)

    mf = MLForecast(models={"spy": Spy()}, freq="D", lags=[1])
    mf.fit(panel, models_fit_kwargs={"spy": {"sample_frac": 0.5}})
    assert calls["sample_frac"] == 0.5


def test_cache_train_df_off(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, cache_train_df=False)
    assert mf.predict(2).count() > 0


def test_sparse_horizons_survive_conformal_calibration(spark, panel):
    """fit(horizons=..., prediction_intervals=...) must stay sparse: the
    nested calibration backtest re-enters fit and must not clobber the
    outer call's trained_horizons_/models_fit_kwargs_."""
    from mlforecast_spark.conformal import PredictionIntervals

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(
        panel,
        horizons=[2, 4],
        prediction_intervals=PredictionIntervals(n_windows=2, h=2),
    )
    assert mf.trained_horizons_ == [2, 4]
    per_h = mf.models_["LinearRegression"]
    assert per_h[0] is None and per_h[1] is not None


def test_models_fit_kwargs_survive_conformal_calibration(spark, panel):
    from mlforecast_spark.conformal import PredictionIntervals

    calls = []

    class Spy(LinearRegression):
        def fit_spark(self, df, cols, target, tag=None):
            calls.append(tag)
            return super().fit_spark(df, cols, target)

    mf = MLForecast(models={"spy": Spy()}, freq="D", lags=[1, 7])
    mf.fit(
        panel,
        models_fit_kwargs={"spy": {"tag": "outer"}},
        prediction_intervals=PredictionIntervals(n_windows=2, h=2),
    )
    # calibration fits AND the final fit all receive the kwargs
    assert calls and all(t == "outer" for t in calls)


def test_empty_horizons_rejected(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    with pytest.raises(ValueError, match="non-empty"):
        mf.fit(panel, horizons=[])


def test_predict_horizons_beyond_h_rejected(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, max_horizon=4)
    with pytest.raises(ValueError, match="exceed the requested h"):
        mf.predict(2, horizons=[4]).count()


def test_transfer_conformal_rejects_ignored_params(spark, panel):
    from mlforecast_spark.conformal import PredictionIntervals

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, prediction_intervals=PredictionIntervals(n_windows=2, h=2))
    with pytest.raises(ValueError, match="does not support"):
        mf.predict(
            2,
            new_df=panel,
            level=[80],
            transfer_conformal="scale_aligned",
            ids=["id_0"],
        )


def test_sparse_horizons_save_load_roundtrip(spark, panel, tmp_path):
    import numpy as np

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel, horizons=[2, 4])
    before = mf.predict(4, horizons=[2, 4]).toPandas().sort_values(
        ["unique_id", "ds"]
    )
    path = str(tmp_path / "sparse_pipeline")
    mf.save(path)
    mf2 = MLForecast.load(path, spark)
    assert mf2.trained_horizons_ == [2, 4]
    after = mf2.predict(4, horizons=[2, 4]).toPandas().sort_values(
        ["unique_id", "ds"]
    )
    np.testing.assert_allclose(
        before["LinearRegression"].to_numpy(),
        after["LinearRegression"].to_numpy(),
        rtol=1e-12,
    )
    with pytest.raises(ValueError, match="was not trained"):
        mf2.predict(4).count()
