"""Pooled seasonal rolling transforms vs a brute-force pandas oracle
(`/root/reference/mlforecast/lag_transforms.py:1095-1127` semantics: value at
parent ordinal o aggregates all bucket rows at ordinals o-lag-i*sl)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms
from mlforecast_spark.lag_transforms import (
    SeasonalRollingMean,
    SeasonalRollingQuantile,
    SeasonalRollingStd,
)
from mlforecast_spark.utils import qcol


def _apply(panel, lag, tfms):
    registry = _parse_transforms(None, {lag: tfms})
    plan = FeaturePlan(schema=PanelSchema(), registry=registry)
    names = list(registry)
    return (
        plan.apply(panel)
        .select(
            "*", *[qcol(n).alias(f"_f{i}") for i, n in enumerate(names)]
        )
        .drop(*names)
        .toPandas()
    ), names


def _add_ord(df, keys):
    sub = df[keys + ["ds"]].drop_duplicates().sort_values(keys + ["ds"]) if keys else (
        df[["ds"]].drop_duplicates().sort_values("ds")
    )
    if keys:
        sub["o"] = sub.groupby(keys)["ds"].rank(method="dense").astype(int) - 1
    else:
        sub["o"] = range(len(sub))
    return df.merge(sub, on=keys + ["ds"] if keys else ["ds"])


def _oracle(df, row, keys, lag, sl, ws, ms, stat, per_ts=None):
    tgt = [row.o - lag - i * sl for i in range(ws) if row.o - lag - i * sl >= 0]
    sub = df[df.o.isin(tgt)]
    for k in keys:
        sub = sub[sub[k] == getattr(row, k)]
    if per_ts:
        vals = sub.groupby("o")["y"].agg(per_ts).to_numpy()
    else:
        vals = sub["y"].to_numpy()
        vals = vals[~np.isnan(vals)]
    if len(vals) >= ms and len(vals) > 0:
        return stat(vals)
    return np.nan


def test_pooled_seasonal_global_mean_std_quantile(spark, panel):
    got, _ = _apply(
        panel,
        2,
        [
            SeasonalRollingMean(season_length=7, window_size=2, global_=True),
            SeasonalRollingStd(
                season_length=7, window_size=3, global_=True, min_samples=2
            ),
            SeasonalRollingQuantile(
                p=0.5, season_length=7, window_size=3, global_=True
            ),
        ],
    )
    raw = _add_ord(panel.toPandas(), [])
    got = _add_ord(got, [])
    specs = [
        (2, 7, 2, 2, np.mean, "_f0"),
        (2, 7, 3, 2, lambda v: np.std(v, ddof=1) if len(v) > 1 else np.nan, "_f1"),
        (2, 7, 3, 3, lambda v: np.quantile(v, 0.5), "_f2"),
    ]
    for lag, sl, ws, ms, stat, col in specs:
        exp = np.array([_oracle(raw, r, [], lag, sl, ws, ms, stat) for r in got.itertuples()])
        np.testing.assert_allclose(
            got[col].to_numpy(dtype=float), exp, rtol=1e-9, equal_nan=True
        )


def test_pooled_seasonal_groupby_and_timeagg(spark, panel_static):
    got, _ = _apply(
        panel_static,
        1,
        [
            SeasonalRollingMean(season_length=5, window_size=2, groupby=["static_0"]),
            SeasonalRollingMean(
                season_length=5,
                window_size=2,
                groupby=["static_0"],
                time_agg="mean",
                min_samples=1,
            ),
        ],
    )
    raw = _add_ord(panel_static.toPandas(), ["static_0"])
    got = got.merge(
        raw[["unique_id", "ds", "o"]].drop_duplicates(), on=["unique_id", "ds"]
    )
    exp0 = np.array(
        [_oracle(raw, r, ["static_0"], 1, 5, 2, 2, np.mean) for r in got.itertuples()]
    )
    exp1 = np.array(
        [
            _oracle(raw, r, ["static_0"], 1, 5, 2, 1, np.mean, per_ts="mean")
            for r in got.itertuples()
        ]
    )
    np.testing.assert_allclose(got["_f0"].to_numpy(dtype=float), exp0, rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(got["_f1"].to_numpy(dtype=float), exp1, rtol=1e-9, equal_nan=True)


def test_pooled_seasonal_partition_by(spark, panel):
    p = panel.withColumn("part", (F.dayofmonth("ds") % 2).cast("string"))
    got, _ = _apply(
        p, 1, [SeasonalRollingMean(season_length=7, window_size=2, partition_by=["part"])]
    )
    raw = _add_ord(p.toPandas(), ["unique_id"])
    got = got.merge(
        raw[["unique_id", "ds", "o"]].drop_duplicates(), on=["unique_id", "ds"]
    )
    # partition-alone mode: parent calendar per id, min_samples defaults to 1
    exp = np.array(
        [
            _oracle(raw, r, ["unique_id", "part"], 1, 7, 2, 1, np.mean)
            for r in got.itertuples()
        ]
    )
    np.testing.assert_allclose(got["_f0"].to_numpy(dtype=float), exp, rtol=1e-9, equal_nan=True)


def test_pooled_seasonal_through_fit_predict(spark, panel):
    from mlforecast_spark import MLForecast
    from mlforecast_spark.models import LinearRegression

    mf = MLForecast(
        models=[LinearRegression()],
        freq="D",
        lags=[1],
        lag_transforms={
            7: [SeasonalRollingMean(season_length=7, window_size=2, global_=True)]
        },
    )
    mf.fit(panel, dropna=False)
    preds = mf.predict(3).toPandas()
    assert preds["LinearRegression"].notna().all()


def test_pooled_rolling_quantile_join_path(spark, panel_static):
    """Pooled RollingQuantile compiles to the bounded ordinal-range join
    (scale path) and matches brute force in global and groupby modes."""
    from mlforecast_spark.lag_transforms import RollingQuantile

    got, _ = _apply(
        panel_static,
        2,
        [
            RollingQuantile(p=0.5, window_size=3, global_=True),
            RollingQuantile(
                p=0.25, window_size=4, groupby=["static_0"], min_samples=2
            ),
        ],
    )
    raw = panel_static.toPandas()

    def oracle(df, row, keys, lag, ws, ms, p):
        sub = df[(df.o >= row.o - lag - ws + 1) & (df.o <= row.o - lag)]
        for k in keys:
            sub = sub[sub[k] == getattr(row, k)]
        v = sub.y.to_numpy()
        v = v[~np.isnan(v)]
        return float(np.quantile(v, p)) if len(v) >= ms and len(v) > 0 else np.nan

    g = _add_ord(raw.copy(), [])
    gm = got.merge(g[["unique_id", "ds", "o"]].drop_duplicates(), on=["unique_id", "ds"])
    exp0 = np.array([oracle(g, r, [], 2, 3, 3, 0.5) for r in gm.itertuples()])
    np.testing.assert_allclose(
        gm["_f0"].to_numpy(dtype=float), exp0, rtol=1e-9, equal_nan=True
    )
    g2 = _add_ord(raw.copy(), ["static_0"])
    gm2 = got.merge(
        g2[["unique_id", "ds", "o"]].drop_duplicates(), on=["unique_id", "ds"]
    )
    exp1 = np.array(
        [oracle(g2, r, ["static_0"], 2, 4, 2, 0.25) for r in gm2.itertuples()]
    )
    np.testing.assert_allclose(
        gm2["_f1"].to_numpy(dtype=float), exp1, rtol=1e-9, equal_nan=True
    )
    # plan stays JVM with no single-partition window over raw rows
    from mlforecast_spark.core import FeaturePlan, PanelSchema, _parse_transforms

    registry = _parse_transforms(
        None, {2: [RollingQuantile(p=0.5, window_size=3, global_=True)]}
    )
    feats = FeaturePlan(schema=PanelSchema(), registry=registry).apply(panel_static)
    plan_str = feats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan_str
