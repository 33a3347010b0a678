"""fourier/trend/pipeline deterministic regressors vs a numpy replay, plus
the (transformed, future) contract wired end-to-end through predict(X_df=)."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.feature_engineering import fourier, pipeline, trend


def _panel(spark):
    rows = []
    for uid, n in (("A", 10), ("B", 7)):
        for t in range(n):
            rows.append((uid, datetime.date(2024, 1, 1 + t), float(t) + (0.5 if uid == "B" else 0.0)))
    return spark.createDataFrame(rows, "unique_id string, ds date, y double")


def test_fourier_matches_numpy(spark):
    df = _panel(spark)
    transformed, future = fourier(df, "D", season_length=7, k=2, h=3)
    got = transformed.toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    assert got.columns.tolist() == [
        "unique_id", "ds", "y", "sin1_7", "cos1_7", "sin2_7", "cos2_7",
    ]
    for uid, n in (("A", 10), ("B", 7)):
        g = got[got.unique_id == uid]
        t = np.arange(1, n + 1)
        for j in (1, 2):
            np.testing.assert_allclose(
                g[f"sin{j}_7"], np.sin(2 * np.pi * j * t / 7), atol=1e-12
            )
            np.testing.assert_allclose(
                g[f"cos{j}_7"], np.cos(2 * np.pi * j * t / 7), atol=1e-12
            )
    fut = future.toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    assert len(fut) == 6  # 2 series x h=3
    a = fut[fut.unique_id == "A"]
    # positions continue at n+1: sin at t=11,12,13
    np.testing.assert_allclose(
        a["sin1_7"], np.sin(2 * np.pi * np.arange(11, 14) / 7), atol=1e-12
    )
    assert [str(d) for d in a["ds"]] == ["2024-01-11", "2024-01-12", "2024-01-13"]


def test_trend_continues_into_future(spark):
    df = _panel(spark)
    transformed, future = trend(df, "D", h=2)
    got = transformed.toPandas()
    assert got[got.unique_id == "B"].sort_values("ds")["trend"].tolist() == [
        1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0,
    ]
    fut = future.toPandas()
    assert fut[fut.unique_id == "B"].sort_values("ds")["trend"].tolist() == [8.0, 9.0]


def test_pipeline_single_window(spark):
    df = _panel(spark)
    transformed, future = pipeline(
        df,
        [(fourier, {"season_length": 7, "k": 1}), trend],
        "D",
        h=2,
    )
    assert transformed.columns == ["unique_id", "ds", "y", "sin1_7", "cos1_7", "trend"]
    # one row_number window total, not one per feature
    plan = transformed._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("row_number") == 1
    # values agree with the standalone builders
    f_t, _ = fourier(df, "D", season_length=7, k=1)
    t_t, _ = trend(df, "D")
    a = transformed.toPandas().sort_values(["unique_id", "ds"]).reset_index(drop=True)
    b = (
        f_t.join(t_t.select("unique_id", "ds", "trend"), ["unique_id", "ds"])
        .toPandas()
        .sort_values(["unique_id", "ds"])
        .reset_index(drop=True)
    )
    for c in ("sin1_7", "cos1_7", "trend"):
        np.testing.assert_allclose(a[c], b[c], atol=1e-12)

    with pytest.raises(ValueError, match="unsupported pipeline feature"):
        pipeline(df, [len], "D")


def test_fourier_features_through_predict(spark):
    """Deterministic regressors as exogenous columns: fit on the transformed
    frame, predict with X_df=future — the companion-library workflow."""
    from mlforecast_spark import MLForecast
    from mlforecast_spark.models import LinearRegression

    rows = []
    for uid in ("A", "B"):
        for t in range(60):
            y = 10.0 + 3.0 * np.sin(2 * np.pi * (t + 1) / 7) + (1.0 if uid == "B" else 0.0)
            rows.append((uid, datetime.date(2024, 1, 1) + datetime.timedelta(days=t), float(y)))
    df = spark.createDataFrame(rows, "unique_id string, ds date, y double")
    transformed, future = fourier(df, "D", season_length=7, k=1, h=7)
    mf = MLForecast(models=[LinearRegression()], freq="D", lags=[7])
    mf.fit(transformed, static_features=[])
    preds = mf.predict(7, X_df=future).toPandas()
    assert len(preds) == 14
    merged = preds.merge(future.toPandas(), on=["unique_id", "ds"])
    # the pure sin target is recovered through the fourier regressors
    expected = 10.0 + 3.0 * merged["sin1_7"] + (merged["unique_id"] == "B") * 1.0
    np.testing.assert_allclose(merged["LinearRegression"], expected, atol=1e-6)


def test_h0_future_frame_is_empty(spark):
    """h=0 (the default) must yield a row-free future frame: sequence(1, 0)
    defaults to step -1 and would emit [1, 0] — two spurious rows per series,
    step 0 duplicating the last in-sample timestamp."""
    df = _panel(spark)
    for fn, kwargs in (
        (fourier, {"season_length": 7, "k": 1}),
        (trend, {}),
    ):
        transformed, future = fn(df, "D", **kwargs)
        assert future.count() == 0
        assert transformed.count() == df.count()
    _, future = pipeline(df, [(fourier, {"season_length": 7, "k": 1}), trend], "D")
    assert future.count() == 0
    # schema survives the empty short-circuit
    assert future.columns == ["unique_id", "ds", "sin1_7", "cos1_7", "trend"]


def test_pipeline_kwargs_validation(spark):
    df = _panel(spark)
    with pytest.raises(ValueError, match="season_length"):
        pipeline(df, [(fourier, {"k": 1})], "D")
    with pytest.raises(ValueError, match="supported entries"):
        pipeline(df, [len], "D")
