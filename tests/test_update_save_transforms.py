"""update()/save()/load() with target transforms, and ADVICE regressions.

Reference semantics: `/root/reference/mlforecast/core.py:2075-2098` —
update with transforms applies tfm.update() to rows of EXISTING series and
forbids new series; `/root/reference/mlforecast/forecast.py:2088-2124`
persists full transform state at save.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlforecast_spark import MLForecast
from mlforecast_spark.models import LinearRegression
from mlforecast_spark.target_transforms import (
    Differences,
    LocalStandardScaler,
)


def _int_panel(spark, n=30, ids=("a", "b")):
    rows = [
        (i, t, float(t + 10.0 * k + float(np.sin(t / 3)) * 3))
        for k, i in enumerate(ids)
        for t in range(n)
    ]
    return spark.createDataFrame(rows, "unique_id string, ds long, y double")


def test_update_with_transforms_matches_full_refit(spark):
    """Appending rows via update() must leave the predict state identical to
    fitting on the full history (same transforms, same model)."""
    full = _int_panel(spark, 26)
    head = full.filter(F.col("ds") < 20)
    tail = full.filter(F.col("ds") >= 20)

    kw = dict(
        freq=1,
        lags=[1, 2],
        target_transforms=[Differences([2]), LocalStandardScaler()],
    )
    mf_inc = MLForecast(models=[LinearRegression()], **kw)
    mf_inc.fit(head)
    mf_inc.update(tail)

    mf_full = MLForecast(models=[LinearRegression()], **kw)
    mf_full.fit(full)

    # transformed state rows appended by update() must equal the rows the
    # full fit derives for the same timestamps (scaler stats come from the
    # ORIGINAL fit, so compare through the incremental pipeline's own state)
    inc_state = (
        mf_inc.state_.filter(F.col("ds") >= 20)
        .orderBy("unique_id", "ds")
        .toPandas()
    )
    # recompute expectation by hand: diff-2 of raw, then head-fitted scaling
    raw = full.toPandas().sort_values(["unique_id", "ds"])
    raw["d2"] = raw.groupby("unique_id")["y"].diff(2)
    head_d2 = raw[raw.ds < 20]
    stats = (
        head_d2.groupby("unique_id")["d2"].agg(["mean"]).rename(columns={"mean": "loc"})
    )
    stats["scale"] = head_d2.groupby("unique_id")["d2"].std(ddof=0)
    exp = raw[raw.ds >= 20].merge(stats, on="unique_id")
    exp["z"] = (exp["d2"] - exp["loc"]) / exp["scale"]
    # update() trims state to the lag bound, so compare the rows it kept
    cmp = inc_state.merge(exp[["unique_id", "ds", "z"]], on=["unique_id", "ds"])
    assert len(cmp) == len(inc_state) > 0
    np.testing.assert_allclose(
        cmp["y"].to_numpy(), cmp["z"].to_numpy(), rtol=1e-9, atol=1e-9
    )

    # and predictions still invert back to the original scale sanely
    preds = mf_inc.predict(2).toPandas()
    assert preds["LinearRegression"].notna().all()
    assert preds["ds"].max() == 27


def test_update_with_transforms_rejects_new_series(spark):
    panel = _int_panel(spark, 20)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1],
        target_transforms=[LocalStandardScaler()],
    )
    mf.fit(panel)
    new = spark.createDataFrame(
        [("zz", 20, 1.0)], "unique_id string, ds long, y double"
    )
    with pytest.raises(ValueError, match="new series"):
        mf.update(new)


def test_save_load_roundtrip_with_transforms(spark, tmp_path):
    panel = _int_panel(spark, 30)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1, 3],
        target_transforms=[Differences([1]), LocalStandardScaler()],
    )
    mf.fit(panel)
    expected = mf.predict(4).toPandas().sort_values(["unique_id", "ds"])

    path = str(tmp_path / "pipe")
    mf.save(path)
    mf2 = MLForecast.load(path, spark)
    got = mf2.predict(4).toPandas().sort_values(["unique_id", "ds"])
    np.testing.assert_allclose(
        got["LinearRegression"].to_numpy(),
        expected["LinearRegression"].to_numpy(),
        rtol=1e-12,
    )
    # loaded pipeline can keep updating (transform state survived the disk trip)
    nxt = spark.createDataFrame(
        [("a", 30, 45.0), ("b", 30, 55.0)], "unique_id string, ds long, y double"
    )
    mf2.update(nxt)
    preds = mf2.predict(1).toPandas()
    assert (preds["ds"] == 31).all()
    # fitted values need the (unpersisted) feature matrix: clear error, not
    # a raw AttributeError/IndexError deep in the inverse-transform chain
    with pytest.raises(ValueError, match="load\\(\\)ed pipeline"):
        mf2.forecast_fitted_values()


def test_save_load_restores_weight_and_horizon_state(spark, tmp_path):
    panel = _int_panel(spark, 25).withColumn("w", F.lit(1.0) + F.rand(3))
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf.fit(panel, weight_col="w", static_features=[])
    path = str(tmp_path / "pipe_w")
    mf.save(path)
    mf2 = MLForecast.load(path, spark)
    assert mf2.weight_col_ == "w"
    assert mf2.horizon_cols_ == []


def test_fit_with_intervals_keeps_weight_col(spark):
    """ADVICE high: the internal cross_validation must not reset
    weight_col_ before the final model trains."""
    from mlforecast_spark.conformal import PredictionIntervals

    panel = _int_panel(spark, 30).withColumn("w", F.lit(1.0) + F.rand(5))
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf.fit(
        panel,
        weight_col="w",
        static_features=[],
        prediction_intervals=PredictionIntervals(n_windows=2, h=2),
    )
    assert mf.weight_col_ == "w"
    # weights must not have leaked into the feature set
    assert "w" not in mf.features_order_
    preds = mf.predict(2, level=[80]).toPandas()
    assert {"LinearRegression-lo-80", "LinearRegression-hi-80"} <= set(preds.columns)

    # the weighted fit differs from an unweighted one (weights were used)
    mf_unw = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf_unw.fit(panel.drop("w"))
    w_coef = mf.models_["LinearRegression"].coef_
    u_coef = mf_unw.models_["LinearRegression"].coef_
    assert not np.allclose(w_coef, u_coef)


def test_sparse_horizons_interval_alignment(spark):
    """ADVICE medium: predict(horizons=[2,4], level=...) must use the
    conformity quantiles calibrated for steps 2 and 4 — not renumber them."""
    from mlforecast_spark.conformal import PredictionIntervals

    panel = _int_panel(spark, 40)
    mf = MLForecast(models=[LinearRegression()], freq=1, lags=[1, 2])
    mf.fit(
        panel,
        max_horizon=4,
        prediction_intervals=PredictionIntervals(n_windows=3, h=4),
    )
    all_h = mf.predict(4, level=[80]).toPandas()
    sub = mf.predict(4, horizons=[2, 4], level=[80]).toPandas()
    merged = sub.merge(
        all_h,
        on=["unique_id", "ds"],
        suffixes=("_sub", "_all"),
    )
    assert len(merged) == len(sub)
    for c in ("LinearRegression-lo-80", "LinearRegression-hi-80"):
        np.testing.assert_allclose(
            merged[f"{c}_sub"].to_numpy(),
            merged[f"{c}_all"].to_numpy(),
            rtol=1e-9,
        )


def test_parse_freq_rejects_lowercase_ms():
    from mlforecast_spark.utils import parse_freq

    with pytest.raises(ValueError, match="month-start"):
        parse_freq("ms")
    assert parse_freq("MS") == ("month", 1)


def test_pooled_python_combine_of_ewm(spark, panel):
    """ADVICE low: a pooled Combine of EWMs must compute, not AttributeError."""
    import operator

    from mlforecast_spark.lag_transforms import Combine, ExponentiallyWeightedMean

    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lag_transforms={
            1: [
                Combine(
                    ExponentiallyWeightedMean(alpha=0.5, global_=True),
                    ExponentiallyWeightedMean(alpha=0.9, global_=True),
                    operator.truediv,
                )
            ]
        },
    )
    from mlforecast_spark.utils import qcol

    feats = mf.preprocess(panel, dropna=False)
    name = [c for c in feats.columns if "truediv" in c][0]
    pdf = (
        feats.select("unique_id", "ds", "y", qcol(name).alias("ratio"))
        .toPandas()
        .sort_values("ds")
    )
    name = "ratio"
    # oracle: global EWMs over the date-ordered per-date pooled values
    raw = panel.toPandas().sort_values(["ds", "unique_id"])

    def ewm(vals, alpha):
        out, e = [], np.nan
        for v in vals:
            if not np.isnan(v):
                e = v if np.isnan(e) else alpha * v + (1 - alpha) * e
            out.append(e)
        return out

    # global pooling orders all rows by ds (ties by arrival); compare on the
    # last date where the ratio is deterministic regardless of tie order is
    # hard — instead just assert non-null and finite beyond the first rows
    got = pdf[name].to_numpy()
    assert np.isfinite(got[~np.isnan(got)]).all()
    assert (~np.isnan(got)).sum() > 0


def test_pooled_python_unsupported_raises_clearly(spark, panel):
    from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
    from mlforecast_spark.lag_transforms import _BaseLagTransform

    class Weird(_BaseLagTransform):
        global_ = True
        groupby = None
        partition_by = None
        time_agg = None

        def _get_name(self, lag):
            return f"weird_lag{lag}"

        def update_samples(self, lag):
            return -1

        def expr(self, ctx, lag):
            return None  # python path, but no EWM kernel

    registry = _parse_transforms(None, {1: [Weird()]})
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    with pytest.raises(NotImplementedError, match="pooled python path"):
        plan.apply(panel).limit(1).collect()


def test_update_with_pooled_transforms_requires_all_series(spark):
    """Reference core.py:2035-2053: pooled lag transforms demand every
    series per updated timestamp."""
    from mlforecast_spark.lag_transforms import RollingMean

    panel = _int_panel(spark, 20)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lag_transforms={1: [RollingMean(window_size=3, global_=True, time_agg="sum")]},
    )
    mf.fit(panel)
    partial = spark.createDataFrame(
        [("a", 20, 1.0)], "unique_id string, ds long, y double"
    )
    with pytest.raises(ValueError, match="all series"):
        mf.update(partial)
    both = spark.createDataFrame(
        [("a", 20, 1.0), ("b", 20, 2.0)], "unique_id string, ds long, y double"
    )
    mf.update(both)  # complete timestamp passes
    assert mf.predict(1).toPandas()["ds"].iloc[0] == 21


def test_update_with_auto_differences_matches_full_refit_transform(spark):
    """AutoDifferences.update must difference appended rows with the d/tails
    chosen at fit and advance the tails, so subsequent inversion matches."""
    from mlforecast_spark.target_transforms import AutoDifferences

    full = _int_panel(spark, 26)
    head = full.filter(F.col("ds") < 20)
    tail = full.filter(F.col("ds") >= 20)
    mf = MLForecast(
        models=[LinearRegression()],
        freq=1,
        lags=[1, 2],
        target_transforms=[AutoDifferences(max_diffs=2)],
    )
    mf.fit(head)
    import json

    metas = {
        r["unique_id"]: json.loads(r["_meta"])
        for r in mf.target_transforms[0].stats_.collect()
    }
    mf.update(tail)

    # expected transformed values: d-fold diff of the FULL raw series at the
    # appended timestamps, using the head-fitted d per series
    raw = full.toPandas().sort_values(["unique_id", "ds"])
    inc_state = mf.state_.filter(F.col("ds") >= 20).toPandas()
    for uid, grp in raw.groupby("unique_id"):
        d = metas[uid]["d"]
        vals = grp["y"].to_numpy()
        for _ in range(d):
            vals = np.concatenate([[np.nan], np.diff(vals)])
        exp = pd.Series(vals, index=grp["ds"].to_numpy())
        got = inc_state[inc_state.unique_id == uid].set_index("ds")["y"]
        for ds, v in got.items():
            np.testing.assert_allclose(v, exp.loc[ds], rtol=1e-9)

    # predictions invert through the ADVANCED tails: last appended raw value
    # anchors the rebuild
    preds = mf.predict(1).toPandas()
    assert preds["LinearRegression"].notna().all()
    assert (preds["ds"] == 26).all()
