"""RandomForest (bagged histogram trees) + the reference auto presets.

Reference surface: `/root/reference/mlforecast/auto.py:49-124` (spaces),
`:147-251` (Auto* presets). The forest itself replaces sklearn's
RandomForestRegressor with the in-repo histogram-tree machinery: Poisson(1)
hash bootstrap in the distributed path, explicit resample locally."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlforecast_spark.models_gbt import RandomForest, _bootstrap_weights


def _xy(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-2, 2, size=(n, 3))
    y = np.where(X[:, 0] > 0, 3.0, -1.0) + 0.5 * X[:, 1] + rng.normal(0, 0.1, n)
    return X, y


def test_local_fit_learns_and_is_deterministic():
    X, y = _xy()
    rf = RandomForest(n_estimators=20, max_depth=4, random_state=7).fit(X, y)
    pred = rf.predict(X)
    resid = y - pred
    assert resid.var() < 0.25 * y.var()
    rf2 = RandomForest(n_estimators=20, max_depth=4, random_state=7).fit(X, y)
    assert np.allclose(pred, rf2.predict(X))


def test_min_samples_split_stumps_to_mean():
    X, y = _xy(n=500)
    rf = RandomForest(
        n_estimators=10, max_depth=4, min_samples_split=10_000, random_state=1
    ).fit(X, y)
    pred = rf.predict(X)
    # no split is legal -> every tree is a bootstrap-mean leaf
    assert np.std(pred) < 1e-9
    assert abs(pred[0] - y.mean()) < 0.2


def test_max_features_subsets_splits():
    X, y = _xy(n=800)
    rf = RandomForest(
        n_estimators=5, max_depth=3, max_features=0.34, random_state=3
    ).fit(X, y)
    # with 3 features and max_features=0.34 each tree may split on exactly
    # one feature; collect used features per tree
    def features_used(node, acc):
        if node is None or node.feature == -1:
            return acc
        acc.add(node.feature)
        features_used(node.left, acc)
        features_used(node.right, acc)
        return acc

    for tree in rf.trees_:
        used = features_used(tree, set())
        assert len(used) <= 1


def test_bootstrap_weights_deterministic_and_poisson_like():
    ids = np.arange(200_000, dtype=np.int64)
    w1 = _bootstrap_weights(ids, 11)
    w2 = _bootstrap_weights(ids, 11)
    assert np.array_equal(w1, w2)
    w3 = _bootstrap_weights(ids, 12)
    assert not np.array_equal(w1, w3)
    # Poisson(1): mean 1, var 1, P(0) ~ e^-1
    assert abs(w1.mean() - 1.0) < 0.02
    assert abs(w1.var() - 1.0) < 0.05
    assert abs((w1 == 0).mean() - np.exp(-1.0)) < 0.01


def test_distributed_path_trains(spark):
    X, y = _xy(n=3000, seed=4)
    import pandas as pd

    pdf = pd.DataFrame({f"f{j}": X[:, j] for j in range(3)})
    pdf["y"] = y
    df = spark.createDataFrame(pdf)
    rf = RandomForest(
        n_estimators=8, max_depth=4, random_state=5, collect_threshold=0
    )
    rf.fit_spark(df, ["f0", "f1", "f2"], "y")
    assert len(rf.trees_) == 8
    pred = rf.predict(X)
    resid = y - pred
    assert resid.var() < 0.3 * y.var()
    # determinism of the hash-bootstrap path
    rf2 = RandomForest(
        n_estimators=8, max_depth=4, random_state=5, collect_threshold=0
    )
    rf2.fit_spark(df, ["f0", "f1", "f2"], "y")
    assert np.allclose(pred, rf2.predict(X))


def test_criterion_validated():
    with pytest.raises(ValueError, match="criterion"):
        RandomForest(criterion="absolute_error")


def test_forest_in_mlforecast_pipeline(panel):
    from mlforecast_spark import MLForecast

    mf = MLForecast(
        models=[RandomForest(n_estimators=10, max_depth=3, random_state=2)],
        freq="D",
        lags=[1, 7],
    )
    mf.fit(panel)
    preds = mf.predict(3).toPandas()
    assert len(preds) == 3 * panel.select("unique_id").distinct().count()
    assert preds["RandomForest"].notna().all()


def test_auto_presets_sample_reference_spaces():
    from mlforecast_spark.auto import (
        AutoElasticNet,
        AutoGBT,
        AutoLasso,
        AutoLinearRegression,
        AutoRandomForest,
        AutoRidge,
    )
    from mlforecast_spark.models import ElasticNet, Lasso, LinearRegression, Ridge
    from mlforecast_spark.models_gbt import GradientBoostedTrees

    rng = random.Random(0)
    m = AutoLinearRegression().sample(rng)
    assert isinstance(m, LinearRegression)
    m = AutoRidge().sample(rng)
    assert isinstance(m, Ridge) and 0.001 <= m.l2 <= 10.0
    m = AutoLasso().sample(rng)
    assert isinstance(m, Lasso) and 0.001 <= m.alpha <= 10.0
    m = AutoElasticNet().sample(rng)
    assert isinstance(m, ElasticNet) and 0.0 <= m.l1_ratio <= 1.0
    m = AutoRandomForest().sample(rng)
    assert isinstance(m, RandomForest)
    assert 50 <= m.n_estimators <= 1000 and 1 <= m.max_depth <= 10
    assert 2 <= m.min_samples_split <= 100 and 0.5 <= m.max_features <= 1.0
    m = AutoGBT().sample(rng)
    assert isinstance(m, GradientBoostedTrees)
    assert 20 <= m.n_estimators <= 1000

    # external presets: constructible iff their libs import (gated)
    from mlforecast_spark.auto import AutoCatboost, AutoLightGBM, AutoXGBoost

    lgbm = AutoLightGBM()  # adapter class imports without synapseml
    assert lgbm.model_cls.__name__ == "SparkLGBMForecast"
    xgb = AutoXGBoost()
    assert xgb.model_cls.__name__ == "SparkXGBForecast"
    try:
        import catboost  # noqa: F401

        AutoCatboost()
    except ImportError:
        with pytest.raises(ImportError):
            AutoCatboost()


def test_automlforecast_with_presets(panel):
    from mlforecast_spark.auto import AutoMLForecast, AutoLinearRegression, AutoRidge

    auto = AutoMLForecast(
        models={"lr": AutoLinearRegression(), "ridge": AutoRidge()},
        freq="D",
        season_length=7,
        num_samples=2,
    )
    auto.fit(panel, n_windows=1, h=3)
    preds = auto.predict(2).toPandas()
    assert {"lr", "ridge"} & set(preds.columns)
