"""Auto* target transforms: per-series adaptive differencing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import SeasonalNaive, LinearRegression
from mlforecast_spark.target_transforms import (
    AutoDifferences,
    AutoSeasonalDifferences,
    AutoSeasonalityAndDifferences,
)


@pytest.fixture(scope="module")
def trend_panel(spark):
    """Series 'a' strongly trending (needs 1 diff), 'b' stationary (0 diffs)."""
    rows = []
    rng = np.random.RandomState(0)
    for t in range(60):
        rows.append(("a", t, 10.0 * t + float(rng.randn()) * 0.1))
        rows.append(("b", t, float(rng.randn())))
    return spark.createDataFrame(rows, "unique_id string, ds long, y double")


def test_auto_differences_chooses_per_series(spark, trend_panel):
    import json

    tfm = AutoDifferences(max_diffs=2)
    tfm.set_column_names("unique_id", "ds", "y")
    out = tfm.fit_transform(trend_panel)
    metas = {r["unique_id"]: json.loads(r["_meta"]) for r in tfm.stats_.collect()}
    assert metas["a"]["d"] >= 1
    assert metas["b"]["d"] == 0
    pdf = out.toPandas()
    a = pdf[pdf.unique_id == "a"].sort_values("ds")["y"].to_numpy()
    # differenced trend ≈ constant 10
    assert abs(np.nanmean(a) - 10.0) < 0.5


def test_auto_differences_roundtrip(spark, trend_panel):
    tfm = AutoDifferences(max_diffs=2)
    tfm.set_column_names("unique_id", "ds", "y")
    transformed = tfm.fit_transform(trend_panel)
    # inverse of a simulated horizon: transform future values the same way
    # and check the rebuild matches
    pdf = trend_panel.toPandas().sort_values(["unique_id", "ds"])
    future = []
    for uid, g in pdf.groupby("unique_id"):
        y = g["y"].to_numpy()
        d = 1 if uid == "a" else 0
        cont = 10.0 * np.arange(60, 65) if uid == "a" else np.zeros(5)
        # transformed-space "predictions": replicate engine semantics
        cur_hist = y.copy()
        pred = cont.copy()
        for _ in range(d):
            full = np.concatenate([cur_hist, pred])
            diffed = full[1:] - full[:-1]
            pred = diffed[-5:]
            cur_hist = diffed[: len(cur_hist) - 1]
        for i, p in enumerate(pred):
            future.append((uid, 60 + i, float(p)))
    fut_df = spark.createDataFrame(future, "unique_id string, ds long, pred double")
    rebuilt = tfm.inverse_transform(fut_df, ["pred"]).toPandas()
    for uid, exp in [("a", 10.0 * np.arange(60, 65)), ("b", np.zeros(5))]:
        got = rebuilt[rebuilt.unique_id == uid].sort_values("ds")["pred"].to_numpy()
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_auto_seasonal_differences(spark):
    rows = []
    for t in range(70):
        rows.append(("s", t, float(t % 7) * 5.0 + 1.0))
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    import json

    tfm = AutoSeasonalDifferences(season_length=7, max_diffs=1)
    tfm.set_column_names("unique_id", "ds", "y")
    out = tfm.fit_transform(panel).toPandas().sort_values("ds")
    meta = json.loads(tfm.stats_.collect()[0]["_meta"])
    assert meta["d"] == 1 and meta["sl"] == 7
    assert np.allclose(out["y"].to_numpy()[7:], 0.0)


def test_auto_seasonality_detection(spark):
    rows = []
    for uid, sl in [("w", 7), ("m", 12)]:
        for t in range(96):
            rows.append((uid, t, float(np.sin(2 * np.pi * t / sl) * 10)))
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    import json

    tfm = AutoSeasonalityAndDifferences(max_season_length=14, max_diffs=1)
    tfm.set_column_names("unique_id", "ds", "y")
    tfm.fit_transform(panel).count()
    metas = {r["unique_id"]: json.loads(r["_meta"]) for r in tfm.stats_.collect()}
    assert metas["w"]["sl"] == 7
    assert metas["m"]["sl"] == 12


def test_auto_differences_in_pipeline(spark, trend_panel):
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[AutoDifferences(max_diffs=1)],
    )
    mf.fit(trend_panel)
    preds = mf.predict(3).toPandas()
    a = preds[preds.unique_id == "a"].sort_values("ds")["LinearRegression"].to_numpy()
    # trending series must keep trending after the inverse rebuild
    np.testing.assert_allclose(a, [600.0, 610.0, 620.0], atol=2.0)
