"""Target transforms: forward vs oracle, and inverse round-trips through the
predict path (mirrors `/root/reference/tests/test_target_transforms.py`)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression, SeasonalNaive
from mlforecast_spark.target_transforms import (
    Differences,
    GlobalSklearnTransformer,
    LocalBoxCox,
    LocalMinMaxScaler,
    LocalRobustScaler,
    LocalStandardScaler,
)


def _roundtrip_check(spark, panel, tfm, rtol=1e-6):
    """fit_transform then inverse_transform of the *training* values must
    reproduce the original target."""
    tfm.set_column_names("unique_id", "ds", "y")
    transformed = tfm.fit_transform(panel)
    inv = tfm.inverse_transform(
        transformed.withColumnRenamed("y", "pred"), ["pred"]
    ).toPandas()
    orig = panel.toPandas()
    merged = orig.merge(inv, on=["unique_id", "ds"])
    np.testing.assert_allclose(merged["pred"], merged["y"], rtol=rtol)


@pytest.mark.parametrize(
    "tfm",
    [
        LocalStandardScaler(),
        LocalMinMaxScaler(),
        LocalRobustScaler("iqr"),
        LocalRobustScaler("mad"),
        GlobalSklearnTransformer("log1p"),
    ],
    ids=["std", "minmax", "iqr", "mad", "log1p"],
)
def test_scaler_roundtrip(spark, panel, tfm):
    _roundtrip_check(spark, panel, tfm)


def test_boxcox_roundtrip(spark, panel):
    _roundtrip_check(spark, panel, LocalBoxCox(), rtol=1e-5)


def test_standard_scaler_values(spark, panel, duck):
    tfm = LocalStandardScaler()
    tfm.set_column_names("unique_id", "ds", "y")
    out = tfm.fit_transform(panel).toPandas()
    duck.register("obs", panel.toPandas())
    exp = duck.execute(
        "SELECT unique_id, ds, (y - AVG(y) OVER (PARTITION BY unique_id)) /"
        " stddev_pop(y) OVER (PARTITION BY unique_id) AS y FROM obs"
    ).df()
    duck.unregister("obs")
    out["ds"] = out["ds"].astype(str)
    exp["ds"] = exp["ds"].astype(str)
    merged = out.merge(exp, on=["unique_id", "ds"], suffixes=("_s", "_d"))
    np.testing.assert_allclose(merged["y_s"], merged["y_d"], rtol=1e-9)


def test_differences_forward(spark, panel, duck):
    tfm = Differences([1, 7])
    tfm.set_column_names("unique_id", "ds", "y")
    out = tfm.fit_transform(panel).toPandas()
    duck.register("obs", panel.toPandas())
    exp = duck.execute(
        "WITH d1 AS (SELECT unique_id, ds,"
        " y - LAG(y, 1) OVER (PARTITION BY unique_id ORDER BY ds) AS y FROM obs)"
        " SELECT unique_id, ds, y - LAG(y, 7) OVER (PARTITION BY unique_id ORDER BY ds) AS y FROM d1"
    ).df()
    duck.unregister("obs")
    out["ds"] = out["ds"].astype(str)
    exp["ds"] = exp["ds"].astype(str)
    merged = out.merge(exp, on=["unique_id", "ds"], suffixes=("_s", "_d"))
    both_nan = merged["y_s"].isna() & merged["y_d"].isna()
    close = np.isclose(merged["y_s"], merged["y_d"]) | both_nan
    assert close.all()


def test_differences_inverse_through_predict(spark):
    """With Differences([1]) and SeasonalNaive on the differenced scale,
    predictions must rebuild in the original scale via the stored tails —
    checked against a hand-rolled pandas recursion."""
    rows = []
    for uid, base in [("a", 10.0), ("b", 50.0)]:
        y = base
        for t in range(30):
            rows.append((uid, t, y))
            y += 1.0 + (0.5 if t % 7 == 0 else 0.0)
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(
        models=[SeasonalNaive(season_length=7)],
        freq=1,
        lags=[7],
        target_transforms=[Differences([1])],
    )
    mf.fit(panel)
    preds = mf.predict(5).toPandas().sort_values(["unique_id", "ds"])
    hist = panel.toPandas().sort_values(["unique_id", "ds"])
    for uid, g in hist.groupby("unique_id"):
        y = g["y"].to_numpy()
        d = np.diff(y)  # differenced history
        tail_d = list(d[-7:])
        last = y[-1]
        exp = []
        for h in range(5):
            pred_d = tail_d[h % 7] if h < 7 else exp_d[h - 7]  # noqa: F821 (h<7 here)
            last = last + pred_d
            exp.append(last)
        got = preds[preds.unique_id == uid]["SeasonalNaive"].to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_scaler_inverse_through_predict(spark, panel):
    """Pipeline: scale -> model -> inverse must equal the unscaled pipeline
    for a scale-equivariant model (SeasonalNaive)."""
    mf_raw = MLForecast(models=[SeasonalNaive(7)], freq="D", lags=[7])
    mf_raw.fit(panel)
    raw = mf_raw.predict(3).toPandas()
    mf_sc = MLForecast(
        models=[SeasonalNaive(7)],
        freq="D",
        lags=[7],
        target_transforms=[LocalStandardScaler()],
    )
    mf_sc.fit(panel)
    sc = mf_sc.predict(3).toPandas()
    merged = raw.merge(sc, on=["unique_id", "ds"], suffixes=("_r", "_s"))
    np.testing.assert_allclose(
        merged["SeasonalNaive_r"], merged["SeasonalNaive_s"], rtol=1e-9
    )
