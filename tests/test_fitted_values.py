"""forecast_fitted_values long tail: Differences inverse via actual lags,
direct mode, distributed recursive h>1 (reference
`/root/reference/mlforecast/forecast.py:978-1120,1318-1423`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression
from mlforecast_spark.target_transforms import Differences, LocalStandardScaler


def _int_panel(spark, n=30, ids=("a", "b")):
    rows = [
        (i, t, float(t + 10.0 * k + float(np.sin(t / 3)) * 3))
        for k, i in enumerate(ids)
        for t in range(n)
    ]
    return spark.createDataFrame(rows, "unique_id string, ds long, y double")


def test_fitted_values_with_differences_actual_lags(spark):
    panel = _int_panel(spark, 30)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1, 2],
        target_transforms=[Differences([2])],
    )
    mf.fit(panel)
    fitted = mf.forecast_fitted_values().toPandas().sort_values(["unique_id", "ds"])
    raw = panel.toPandas().sort_values(["unique_id", "ds"])

    # y must invert exactly back to the original values (actual lags, not a
    # recursive rebuild)
    merged = fitted.merge(raw, on=["unique_id", "ds"], suffixes=("_f", ""))
    np.testing.assert_allclose(merged["y_f"], merged["y"], rtol=1e-12)

    # hand-computed model prediction: model scored on diffed features, plus
    # the ACTUAL y[t-2]
    raw["d2"] = raw.groupby("unique_id")["y"].diff(2)
    raw["d2_l1"] = raw.groupby("unique_id")["d2"].shift(1)
    raw["d2_l2"] = raw.groupby("unique_id")["d2"].shift(2)
    raw["y_l2"] = raw.groupby("unique_id")["y"].shift(2)
    model = mf.models_["LinearRegression"]
    a = np.asarray(model.coef_, dtype=float)
    b = float(model.intercept_)
    raw["exp"] = raw["d2_l1"] * a[0] + raw["d2_l2"] * a[1] + b + raw["y_l2"]
    cmp = fitted.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"])
    cmp = cmp.dropna(subset=["exp"])
    assert len(cmp) == len(fitted)
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_differences_then_scaler(spark):
    panel = _int_panel(spark, 28)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[Differences([1]), LocalStandardScaler()],
    )
    mf.fit(panel)
    fitted = mf.forecast_fitted_values().toPandas()
    raw = panel.toPandas()
    merged = fitted.merge(raw, on=["unique_id", "ds"], suffixes=("_f", ""))
    np.testing.assert_allclose(merged["y_f"], merged["y"], rtol=1e-9)


def test_fitted_values_direct_mode(spark):
    panel = _int_panel(spark, 40)
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf.fit(panel, max_horizon=3)
    f1 = mf.forecast_fitted_values(h=1).toPandas()
    f3 = mf.forecast_fitted_values(h=3).toPandas()
    assert (f1["h"] == 1).all() and (f3["h"] == 3).all()
    # horizon-3 rows end 2 steps later than horizon-1 rows start allows
    assert f3["ds"].max() == f1["ds"].max()
    # hand-check h=3: model_3 scored on features at frontier tau, aligned to
    # tau+2
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["l1"] = raw.groupby("unique_id")["y"].shift(1)
    raw["l2"] = raw.groupby("unique_id")["y"].shift(2)
    m3 = mf.models_["LinearRegression"][2]
    a = np.asarray(m3.coef_, dtype=float)
    b = float(m3.intercept_)
    raw["pred_at_tau"] = raw["l1"] * a[0] + raw["l2"] * a[1] + b
    raw["exp"] = raw["pred_at_tau"]
    raw["ds_target"] = raw["ds"] + 2
    cmp = f3.merge(
        raw[["unique_id", "ds_target", "exp"]],
        left_on=["unique_id", "ds"],
        right_on=["unique_id", "ds_target"],
    ).dropna(subset=["exp"])
    assert len(cmp) == len(f3)
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_recursive_h2_matches_manual_rollout(spark):
    panel = _int_panel(spark, 25)
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1])
    mf.fit(panel)
    f2 = mf.forecast_fitted_values(h=2).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    # 2-step rollout from origin t-2: yhat1 = a*y[t-2]+b; yhat2 = a*yhat1+b
    raw["y_l2"] = raw.groupby("unique_id")["y"].shift(2)
    raw["exp"] = a * (a * raw["y_l2"] + b) + b
    cmp = f2.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f2) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)
    # h=2 targets start one step later than h=1 targets
    f1 = mf.forecast_fitted_values(h=1).toPandas()
    assert f2["ds"].min() == f1["ds"].min() + 1


def test_fitted_values_h2_rejects_unbounded_transforms(spark, panel):
    from mlforecast_spark.lag_transforms import ExpandingMean

    mf = MLForecast(
        models=[LinearRegression()], freq="D", lag_transforms={1: [ExpandingMean()]}
    )
    mf.fit(panel)
    with pytest.raises(NotImplementedError, match="allow_unbounded_history"):
        mf.forecast_fitted_values(h=2)


def test_fitted_values_recursive_h2_with_scaler(spark):
    """h>1 fitted values with a scaler: transform once, replicate origins,
    inverse per original series — pinned against a manual scaled rollout."""
    panel = _int_panel(spark, 25)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[LocalStandardScaler()],
    )
    mf.fit(panel)
    f2 = mf.forecast_fitted_values(h=2).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    stats = raw.groupby("unique_id")["y"].agg(["mean"]).rename(columns={"mean": "loc"})
    stats["scale"] = raw.groupby("unique_id")["y"].std(ddof=0)
    raw = raw.merge(stats, on="unique_id")
    raw["z"] = (raw["y"] - raw["loc"]) / raw["scale"]
    raw["z_l2"] = raw.groupby("unique_id")["z"].shift(2)
    raw["exp"] = (a * (a * raw["z_l2"] + b) + b) * raw["scale"] + raw["loc"]
    cmp = f2.merge(raw[["unique_id", "ds", "exp", "loc", "scale"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f2) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)
    # y column back in the original scale
    raw_chk = f2.merge(panel.toPandas(), on=["unique_id", "ds"], suffixes=("_f", ""))
    np.testing.assert_allclose(raw_chk["y_f"], raw_chk["y"], rtol=1e-9)


def test_fitted_values_h3_with_differences_matches_manual_rollout(spark):
    """h=3 with Differences([1]): the model rolls out 3 steps on the diffed
    series from origin t-3, and the inverse adds back the ACTUAL level at the
    origin plus the origin's own reconstructions beyond it — the closed form
    is y[t-3] + dhat1 + dhat2 + dhat3."""
    panel = _int_panel(spark, 28)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[Differences([1])],
    )
    mf.fit(panel)
    f3 = mf.forecast_fitted_values(h=3).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["d"] = raw.groupby("unique_id")["y"].diff(1)
    # rollout on the diffed series from origin t-3: last observed diff is d[t-3]
    raw["d_l3"] = raw.groupby("unique_id")["d"].shift(3)
    d1 = a * raw["d_l3"] + b
    d2 = a * d1 + b
    d3 = a * d2 + b
    raw["y_l3"] = raw.groupby("unique_id")["y"].shift(3)
    raw["exp"] = raw["y_l3"] + d1 + d2 + d3
    cmp = f3.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f3) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)
    # y column carries the actual values
    merged = f3.merge(raw[["unique_id", "ds"]].assign(
        y_true=panel.toPandas().sort_values(["unique_id", "ds"])["y"].values
    ), on=["unique_id", "ds"])
    np.testing.assert_allclose(merged["y"], merged["y_true"], rtol=1e-12)


def test_fitted_values_h3_with_difference_2_uses_actuals_within_d(spark):
    """Differences([2]) at h=3: steps 1 and 2 add back ACTUAL levels
    (t-3 and t-2 positions... i.e. p+i-2 <= p), step 3 adds the origin's own
    step-1 reconstruction: closed form y[t-2... ] verified per step."""
    panel = _int_panel(spark, 28)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[Differences([2])],
    )
    mf.fit(panel)
    f3 = mf.forecast_fitted_values(h=3).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["d"] = raw.groupby("unique_id")["y"].diff(2)
    # origin p = t-3: last observed diff d[p] = d[t-3]
    raw["d_l3"] = raw.groupby("unique_id")["d"].shift(3)
    d1 = a * raw["d_l3"] + b
    d2 = a * d1 + b
    d3 = a * d2 + b
    # levels: lvl[p+1] = d1 + y[p-1], lvl[p+2] = d2 + y[p], lvl[p+3] = d3 + lvl[p+1]
    raw["y_l4"] = raw.groupby("unique_id")["y"].shift(4)  # y[p-1] for t=p+3
    raw["y_l3"] = raw.groupby("unique_id")["y"].shift(3)  # y[p]
    lvl1 = d1 + raw["y_l4"]
    raw["exp"] = d3 + lvl1
    cmp = f3.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f3) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_h2_differences_then_scaler(spark):
    """Mixed chain [Differences, LocalStandardScaler] at h=2: scaler inverse
    per original series, then the per-origin Differences recursion."""
    panel = _int_panel(spark, 26)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[Differences([1]), LocalStandardScaler()],
    )
    mf.fit(panel)
    f2 = mf.forecast_fitted_values(h=2).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["d"] = raw.groupby("unique_id")["y"].diff(1)
    stats = raw.groupby("unique_id")["d"].agg(loc="mean")
    stats["scale"] = raw.groupby("unique_id")["d"].std(ddof=0)
    raw = raw.merge(stats, on="unique_id")
    raw["z"] = (raw["d"] - raw["loc"]) / raw["scale"]
    raw["z_l2"] = raw.groupby("unique_id")["z"].shift(2)
    z1 = a * raw["z_l2"] + b
    z2 = a * z1 + b
    d1 = z1 * raw["scale"] + raw["loc"]
    d2 = z2 * raw["scale"] + raw["loc"]
    raw["y_l2"] = raw.groupby("unique_id")["y"].shift(2)
    raw["exp"] = raw["y_l2"] + d1 + d2
    cmp = f2.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f2) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_h2_unbounded_history_opt_in(spark):
    """ExpandingMean is refused at h=2 by default (quadratic origin
    replication); with allow_unbounded_history=True the rollout must match a
    manual pandas re-computation per origin."""
    import pandas as pd
    from mlforecast_spark.lag_transforms import ExpandingMean

    panel = _int_panel(spark, 18)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        lag_transforms={1: [ExpandingMean()]},
    )
    mf.fit(panel)
    with pytest.raises(NotImplementedError, match="allow_unbounded_history"):
        mf.forecast_fitted_values(h=2)
    f2 = (
        mf.forecast_fitted_values(h=2, allow_unbounded_history=True)
        .toPandas()
        .sort_values(["unique_id", "ds"])
    )
    model = mf.models_["LinearRegression"]
    a = np.asarray(model.coef_, dtype=float)
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    exp_rows = []
    for uid, g in raw.groupby("unique_id"):
        y = g["y"].to_numpy()
        for p in range(1, len(y) - 1):  # origin position (1-based p = index p)
            hist = list(y[:p])
            # step 1: features from actual history
            yh1 = a[0] * hist[-1] + a[1] * np.mean(hist) + b
            # step 2: history extended by the step-1 prediction
            hist2 = hist + [yh1]
            yh2 = a[0] * hist2[-1] + a[1] * np.mean(hist2) + b
            exp_rows.append((uid, int(g["ds"].iloc[p + 1]), yh2))
    exp = pd.DataFrame(exp_rows, columns=["unique_id", "ds", "exp"])
    cmp = f2.merge(exp, on=["unique_id", "ds"]).dropna(subset=["exp"])
    assert len(cmp) == len(f2) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_h1_autodifferences_uses_actual_lags(spark):
    """h=1 with AutoDifferences (the trending panel makes every series pick
    d=1): the inverse must add back the ACTUAL y[t-1], not rebuild from the
    end-of-training tails — y round-trips exactly and the model column
    matches the closed form a*d[t-1] + b + y[t-1]."""
    from mlforecast_spark.target_transforms import AutoDifferences

    panel = _int_panel(spark, 30)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[AutoDifferences(max_diffs=1)],
    )
    mf.fit(panel)
    metas = {r[0]: r[1] for r in mf.target_transforms[0].stats_.collect()}
    assert all('"d": 1' in m for m in metas.values())
    fitted = mf.forecast_fitted_values().toPandas().sort_values(["unique_id", "ds"])
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    merged = fitted.merge(raw, on=["unique_id", "ds"], suffixes=("_f", ""))
    np.testing.assert_allclose(merged["y_f"], merged["y"], rtol=1e-12)
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw["d"] = raw.groupby("unique_id")["y"].diff(1)
    raw["d_l1"] = raw.groupby("unique_id")["d"].shift(1)
    raw["y_l1"] = raw.groupby("unique_id")["y"].shift(1)
    raw["exp"] = a * raw["d_l1"] + b + raw["y_l1"]
    cmp = fitted.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(fitted) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)


def test_fitted_values_h3_autodifferences_matches_manual_rollout(spark):
    """h=3 with AutoDifferences(1) (every series picks d=1): same closed form
    as the Differences([1]) case — y[t-3] + dhat1 + dhat2 + dhat3 — but the
    per-origin inverse must route through the per-series meta."""
    from mlforecast_spark.target_transforms import AutoDifferences

    panel = _int_panel(spark, 28)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[AutoDifferences(max_diffs=1)],
    )
    mf.fit(panel)
    f3 = mf.forecast_fitted_values(h=3).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["d"] = raw.groupby("unique_id")["y"].diff(1)
    raw["d_l3"] = raw.groupby("unique_id")["d"].shift(3)
    d1 = a * raw["d_l3"] + b
    d2 = a * d1 + b
    d3 = a * d2 + b
    raw["y_l3"] = raw.groupby("unique_id")["y"].shift(3)
    raw["exp"] = raw["y_l3"] + d1 + d2 + d3
    cmp = f3.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f3) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)
    merged = f3.merge(raw[["unique_id", "ds", "y"]], on=["unique_id", "ds"],
                      suffixes=("_f", ""))
    np.testing.assert_allclose(merged["y_f"], merged["y"], rtol=1e-12)


def test_fitted_values_h2_autoseasonal_uses_seasonal_lag(spark):
    """h=2 with AutoSeasonalDifferences(season_length=7): steps 1 and 2 are
    both within sl=7, so each adds back an ACTUAL seasonal level — closed
    form y[p+i-7] + dhat_i per step."""
    from mlforecast_spark.target_transforms import AutoSeasonalDifferences

    rows = [
        (i, t, float(10.0 * k + [5, 1, 2, 8, 3, 9, 4][t % 7] + 0.5 * t))
        for k, i in enumerate(("a", "b"))
        for t in range(42)
    ]
    panel = spark.createDataFrame(rows, "unique_id string, ds long, y double")
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[AutoSeasonalDifferences(season_length=7, max_diffs=1)],
    )
    mf.fit(panel)
    metas = {r[0]: r[1] for r in mf.target_transforms[0].stats_.collect()}
    assert all('"d": 1' in m and '"sl": 7' in m for m in metas.values())
    f2 = mf.forecast_fitted_values(h=2).toPandas().sort_values(["unique_id", "ds"])
    model = mf.models_["LinearRegression"]
    a = float(np.asarray(model.coef_, dtype=float)[0])
    b = float(model.intercept_)
    raw = panel.toPandas().sort_values(["unique_id", "ds"])
    raw["d"] = raw.groupby("unique_id")["y"].diff(7)
    # origin p = t-2: rollout dhat1 = a*d[p] + b, dhat2 = a*dhat1 + b;
    # y_hat[p+2] = dhat2 + y[p+2-7] (actual: 2 <= sl)
    raw["d_l2"] = raw.groupby("unique_id")["d"].shift(2)
    d1 = a * raw["d_l2"] + b
    d2 = a * d1 + b
    raw["y_l7"] = raw.groupby("unique_id")["y"].shift(7)
    raw["exp"] = d2 + raw["y_l7"]
    cmp = f2.merge(raw[["unique_id", "ds", "exp"]], on=["unique_id", "ds"]).dropna(
        subset=["exp"]
    )
    assert len(cmp) == len(f2) > 0
    np.testing.assert_allclose(cmp["LinearRegression"], cmp["exp"], rtol=1e-9)
