"""Gradient-boosted trees: numpy core, distributed-histogram parity, pipeline."""

import numpy as np
import pytest

from mlforecast_spark import MLForecast
from mlforecast_spark.models_gbt import GradientBoostedTrees


def test_gbt_learns_nonlinear(spark):
    rng = np.random.RandomState(0)
    X = rng.randn(4000, 4)
    y = 2 * X[:, 0] + np.where(X[:, 1] > 0, 3.0, -1.0) + 0.05 * rng.randn(4000)
    m = GradientBoostedTrees(n_estimators=40, max_depth=4)
    m.fit(X[:3000], y[:3000])
    pred = m.predict(X[3000:])
    r2 = 1 - np.var(y[3000:] - pred) / np.var(y[3000:])
    assert r2 > 0.9, r2


def test_distributed_hist_matches_local(spark):
    rng = np.random.RandomState(1)
    X = rng.randn(1500, 3)
    y = X[:, 0] * 2 + (X[:, 2] > 0.5) * 4 + 0.05 * rng.randn(1500)
    rows = [(float(y[i]), *[float(v) for v in X[i]]) for i in range(1500)]
    df = spark.createDataFrame(rows, "y double, f0 double, f1 double, f2 double")
    feats = ["f0", "f1", "f2"]
    local = GradientBoostedTrees(n_estimators=5, max_depth=3)
    local.fit_spark(df, feats, "y")
    dist = GradientBoostedTrees(n_estimators=5, max_depth=3, collect_threshold=0)
    dist.fit_spark(df, feats, "y")
    np.testing.assert_allclose(local.predict(X), dist.predict(X), atol=1e-12)


def test_gbt_in_forecast_pipeline(spark, panel):
    mf = MLForecast(
        models=[GradientBoostedTrees(n_estimators=20, max_depth=3)],
        freq="D",
        lags=[1, 7],
    )
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    n_series = panel.select("unique_id").distinct().count()
    assert len(preds) == 3 * n_series
    assert preds["GradientBoostedTrees"].notna().all()
    # sanity: predictions in the data's ballpark
    ymax = panel.agg({"y": "max"}).collect()[0][0]
    assert preds["GradientBoostedTrees"].abs().max() < 3 * ymax


def test_tree_expression_scoring_bit_exact(spark):
    """_score_columns (opt-in JVM CASE-cascade scoring) must reproduce the
    numpy tree walk exactly, including null/NaN -> 0.0 binning semantics.
    It is NOT the default path — see the measured negative result in its
    docstring."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from mlforecast_spark.models_gbt import (
        GradientBoostedTrees,
        RandomForest,
        _score_columns,
    )

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (2500, 3))
    y = np.where(X[:, 0] > 0, 3.0, -1.0) + 0.5 * X[:, 1] + rng.normal(0, 0.1, 2500)
    Xn = X.copy()
    Xn[::17, 1] = np.nan

    gbt = GradientBoostedTrees(n_estimators=12, max_depth=4).fit(X, y)
    rf = RandomForest(n_estimators=7, max_depth=4, random_state=3).fit(X, y)
    pdf = pd.DataFrame({f"f{j}": Xn[:, j] for j in range(3)})
    df = spark.createDataFrame(pdf)
    feats = ["f0", "f1", "f2"]

    expr = F.lit(gbt.base_score_)
    for c in _score_columns(gbt, feats):
        expr = expr + F.lit(gbt.learning_rate) * c
    got = np.array(df.select(expr.alias("p")).toPandas()["p"])
    assert np.abs(got - gbt.predict(Xn)).max() == 0.0

    cols = _score_columns(rf, feats)
    expr = F.lit(0.0)
    for c in cols:
        expr = expr + c
    got = np.array(df.select((expr / len(cols)).alias("p")).toPandas()["p"])
    assert np.abs(got - rf.predict(Xn)).max() == 0.0
