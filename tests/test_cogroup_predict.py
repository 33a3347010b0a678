"""Engine equality: predict(engine='cogroup') vs the lockstep Spark loop.

The cogrouped engine (mlforecast_spark/local_predict.py) runs the whole
h-step recursive rollout per series inside one applyInPandas job; the loop
engine advances all series per step with Spark windows. Both must produce
the same forecasts — these tests compare them on feature sets covering
every frontier kernel (`_BaseLagTransform.frontier_fn`).
"""

import operator

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.lag_transforms import (
    Combine,
    ExpandingMean,
    ExpandingQuantile,
    ExpandingStd,
    ExponentiallyWeightedMean,
    Lag,
    Offset,
    RollingMax,
    RollingMean,
    RollingMin,
    RollingQuantile,
    RollingStd,
    SeasonalRollingMean,
    SeasonalRollingStd,
)
from mlforecast_spark.models import LinearRegression, SeasonalNaive
from mlforecast_spark.target_transforms import Differences, LocalStandardScaler


def _compare(mf, h, **predict_kwargs):
    loop = mf.predict(h, **predict_kwargs).toPandas()
    cg = mf.predict(h, engine="cogroup", **predict_kwargs).toPandas()
    assert sorted(loop.columns) == sorted(cg.columns)
    key = ["unique_id", "ds"]
    loop = loop.sort_values(key).reset_index(drop=True)
    cg = cg[loop.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        loop[key], cg[key], check_dtype=False
    )
    for c in loop.columns:
        if c in key:
            continue
        np.testing.assert_allclose(
            loop[c].to_numpy(dtype="float64"),
            cg[c].to_numpy(dtype="float64"),
            rtol=1e-8,
            atol=1e-10,
            err_msg=f"column {c}",
        )
    return cg


def test_all_kernels_equal(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={
            1: [
                RollingMean(window_size=7),
                RollingStd(window_size=7, min_samples=2),
                RollingMin(window_size=5),
                RollingMax(window_size=5),
                RollingQuantile(p=0.5, window_size=9, min_samples=3),
                ExpandingMean(),
                ExpandingStd(),
                ExpandingQuantile(p=0.25),
                ExponentiallyWeightedMean(alpha=0.9),
                Offset(RollingMean(window_size=3), 1),
                Combine(Lag(1), Lag(7), operator.truediv),
            ],
            2: [SeasonalRollingMean(season_length=7, window_size=3, min_samples=1)],
        },
        date_features=["dayofweek", "month", "is_month_start"],
    )
    mf.fit(panel)
    _compare(mf, 6)


def test_seasonal_std_and_multi_model(spark, panel):
    mf = MLForecast(
        models=[LinearRegression(), SeasonalNaive(season_length=7)],
        freq="D",
        lags=[7],
        lag_transforms={
            1: [SeasonalRollingStd(season_length=7, window_size=4, min_samples=2)]
        },
    )
    mf.fit(panel)
    cg = _compare(mf, 10)
    assert set(cg.columns) >= {"LinearRegression", "SeasonalNaive"}


def test_statics_and_date_dummies(spark, panel_static):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={1: [RollingMean(window_size=4)]},
        date_features=["dayofweek"],
        date_features_as_dummies=True,
    )
    mf.fit(panel_static, static_features=["static_0", "static_1"])
    _compare(mf, 4)


def test_dynamic_exog(spark, panel):
    from mlforecast_spark.utils import future_grid

    p = panel.withColumn("price", (F.dayofmonth("ds") / 31.0))
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 2])
    mf.fit(p, static_features=[])
    X_df = future_grid(p, "D", 3).withColumn(
        "price", (F.dayofmonth("ds") / 31.0)
    )
    _compare(mf, 3, X_df=X_df)


def test_target_transforms_and_ids(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        target_transforms=[Differences([1]), LocalStandardScaler()],
    )
    mf.fit(panel)
    _compare(mf, 5, ids=["id_0", "id_2"])


def test_callable_transform_fallback(spark, panel):
    def diff_mean(x):
        out = np.full(len(x), np.nan)
        for i in range(1, len(x)):
            window = x[max(0, i - 3) : i]
            window = window[~np.isnan(window)]
            if len(window):
                out[i] = x[i] - window.mean() if not np.isnan(x[i]) else np.nan
        return out

    mf2 = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={1: [diff_mean]},
    )
    mf2.fit(panel)
    _compare(mf2, 3)


def test_integer_freq(spark):
    pdf = pd.DataFrame(
        {
            "unique_id": np.repeat(["a", "b"], 30),
            "ds": np.tile(np.arange(30), 2),
            "y": np.arange(60, dtype="float64") ** 1.1,
        }
    )
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1, 3],
        lag_transforms={1: [ExpandingMean()]},
    )
    mf.fit(spark.createDataFrame(pdf))
    _compare(mf, 4)


def test_short_series_null_features(spark):
    """A series shorter than the lag yields null features; both engines
    must propagate that to null/NaN predictions identically."""
    pdf = pd.DataFrame(
        {
            "unique_id": ["a"] * 3 + ["b"] * 30,
            "ds": list(range(3)) + list(range(30)),
            "y": [1.0, 2.0, 3.0] + [float(t) for t in range(30)],
        }
    )
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[7])
    mf.fit(spark.createDataFrame(pdf))
    _compare(mf, 2)


def test_bucketed_rollout_identical(spark, panel):
    """bucket_by groups series by hash bucket; values must be identical to
    per-series groups (incl. with dynamic exog through the cogroup join)."""
    from mlforecast_spark.utils import future_grid

    p = panel.withColumn("price", (F.dayofmonth("ds") / 31.0))
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
    )
    mf.fit(p, static_features=[])
    X_df = future_grid(p, "D", 4).withColumn("price", (F.dayofmonth("ds") / 31.0))
    key = ["unique_id", "ds"]
    base = (
        mf.predict(4, X_df=X_df, engine="cogroup")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    bucketed = (
        mf.predict(4, X_df=X_df, engine="cogroup", cogroup_buckets=3)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, bucketed[base.columns])


def test_sort_output_false_same_values(spark, panel):
    """sort_output=False drops only the final global orderBy: the row SET is
    identical for both engines, and the unsorted plan carries no Sort/range
    exchange above the rollout."""
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
    )
    mf.fit(panel)
    key = ["unique_id", "ds"]
    for eng in ("spark", "cogroup"):
        ordered = mf.predict(4, engine=eng).toPandas()
        unordered = (
            mf.predict(4, engine=eng, sort_output=False)
            .toPandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            ordered.sort_values(key).reset_index(drop=True),
            unordered[ordered.columns],
        )
    plan = mf.predict(
        4, engine="cogroup", sort_output=False
    )._jdf.queryExecution().optimizedPlan().toString()
    global_sorts = [
        ln for ln in plan.splitlines() if "Sort [" in ln and "], true" in ln
    ]
    assert not global_sorts, global_sorts
    plan_sorted = mf.predict(
        4, engine="cogroup"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert any(
        "Sort [" in ln and "], true" in ln for ln in plan_sorted.splitlines()
    )


def test_generic_numpy_model(spark, panel):
    """A model with only fit/predict (no Spark scorer): the loop engine
    scores it via a broadcast pandas_udf, the cogroup engine calls predict
    directly in the rollout — both must agree."""

    class TinyKNN:
        allow_driver_collect = True

        def fit(self, X, y):
            self.X, self.y = X, y
            return self

        def predict(self, X):
            out = np.empty(len(X))
            for i, row in enumerate(np.asarray(X, dtype="float64")):
                d = ((self.X - row) ** 2).sum(axis=1)
                out[i] = self.y[np.argsort(d)[:3]].mean()
            return out

    mf = MLForecast(models={"knn": TinyKNN()}, freq="D", lags=[1, 2])
    mf.fit(panel)
    _compare(mf, 3)


def test_monthly_freq_midday_timestamps(spark):
    """Month stepping must match the loop exactly: Spark's add_months
    truncates to the date (midnight on the cast back to timestamp), so the
    cogroup engine must drop time-of-day too or every downstream join on ds
    silently matches nothing."""
    ts = pd.date_range("2020-01-15 06:00", periods=30, freq="MS") + pd.Timedelta(
        hours=6
    )
    pdf = pd.DataFrame(
        {
            "unique_id": ["a"] * 30,
            "ds": ts,
            "y": np.arange(30, dtype="float64"),
        }
    )
    mf = MLForecast(models=[LinearRegression()], freq="MS", lags=[1, 12])
    mf.fit(spark.createDataFrame(pdf))
    cg = _compare(mf, 4)
    assert all(pd.Timestamp(d).hour == 0 for d in cg["ds"])


def test_direct_mode_rejects_cogroup(spark, panel):
    from mlforecast_spark.local_predict import CogroupUnsupportedError

    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel, max_horizon=3)
    with pytest.raises(CogroupUnsupportedError, match="direct-mode"):
        mf.predict(3, engine="cogroup")


def test_unsupported_raises_typed_error(spark, panel):
    """Fallback call sites catch CogroupUnsupportedError by TYPE — the
    refusals must all raise it (a plain ValueError would break them)."""
    from mlforecast_spark.local_predict import CogroupUnsupportedError

    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={1: [RollingMean(window_size=7, global_=True)]},
    )
    mf.fit(panel)
    with pytest.raises(CogroupUnsupportedError):
        mf.predict(3, engine="cogroup")


def test_engine_auto(spark, panel):
    """'auto' routes eligible pipelines through the cogroup rollout and
    silently falls back to the loop for pooled features / callbacks."""
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
    mf.fit(panel)
    auto = mf.predict(3, engine="auto")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # took the cogroup path

    pooled = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={1: [RollingMean(window_size=7, global_=True)]},
    )
    pooled.fit(panel)
    out = pooled.predict(2, engine="auto")  # must NOT raise
    assert out.count() > 0
    cb = mf.predict(2, engine="auto", before_predict_callback=lambda df: df)
    assert cb.count() > 0  # callback forces the loop, silently


def test_stream_replay_guard():
    from mlforecast_spark.streaming import _replay_guard

    class MF:
        pass

    mf = MF()
    assert not _replay_guard(mf, 0)  # first delivery: apply
    assert _replay_guard(mf, 0)  # redelivery: skip
    assert not _replay_guard(mf, 1)  # next batch: apply
    assert _replay_guard(mf, 0)  # stale redelivery: skip


def test_pooled_feature_rejected(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={1: [RollingMean(window_size=7, global_=True)]},
    )
    mf.fit(panel)
    with pytest.raises(ValueError, match="pooled"):
        mf.predict(3, engine="cogroup")


def test_callbacks_rejected(spark, panel):
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1])
    mf.fit(panel)
    with pytest.raises(ValueError, match="callback"):
        mf.predict(3, engine="cogroup", before_predict_callback=lambda df: df)


def test_cross_validation_engine(spark, panel):
    def build():
        return MLForecast(
            models=[LinearRegression()],
            freq="D",
            lags=[1, 7],
            lag_transforms={1: [RollingMean(window_size=7, min_samples=1)]},
        )

    key = ["unique_id", "ds", "cutoff"]
    loop = build().cross_validation(panel, n_windows=2, h=4).toPandas()
    cg = build().cross_validation(
        panel, n_windows=2, h=4, engine="cogroup"
    ).toPandas()
    loop = loop.sort_values(key).reset_index(drop=True)
    cg = cg[loop.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(loop[key], cg[key], check_dtype=False)
    np.testing.assert_allclose(
        loop["LinearRegression"], cg["LinearRegression"], rtol=1e-8
    )


def test_conformal_fit_engine(spark, panel):
    """fit(engine='cogroup') routes the conformal-calibration backtest
    through the cogrouped rollout; intervals must match the loop engine."""
    from mlforecast_spark.conformal import PredictionIntervals

    def run(engine):
        mf = MLForecast(models=[LinearRegression()], freq="D", lags=[1, 7])
        mf.fit(
            panel,
            prediction_intervals=PredictionIntervals(n_windows=2, h=3),
            engine=engine,
        )
        return (
            mf.predict(3, level=[80])
            .toPandas()
            .sort_values(["unique_id", "ds"])
            .reset_index(drop=True)
        )

    a, b = run("spark"), run("cogroup")
    for c in a.columns:
        if a[c].dtype.kind == "f":
            np.testing.assert_allclose(a[c], b[c], rtol=1e-8, err_msg=c)


def test_new_df_warmup(spark, panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1, 7],
        lag_transforms={1: [RollingMean(window_size=7)]},
    )
    mf.fit(panel)
    new_df = panel.filter(F.col("unique_id").isin(["id_1", "id_3"]))
    _compare(mf, 4, new_df=new_df)
