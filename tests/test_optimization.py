"""mlforecast_objective parity surface (reference optimization.py:46-190):
config sampling through the Trial duck-type, CV-loss evaluation, the
no-features inf guard, and config recording on user attrs."""

import random

import numpy as np
import pytest

from mlforecast_spark.auto import smape_loss
from mlforecast_spark.models import LinearRegression, Ridge
from mlforecast_spark.optimization import RandomTrial, mlforecast_objective


@pytest.fixture(scope="module")
def opt_panel(spark):
    rows = [
        (i, t, float(t + 10.0 * k + np.sin(t / 3) * 3))
        for k, i in enumerate(("a", "b"))
        for t in range(40)
    ]
    return spark.createDataFrame(rows, "unique_id string, ds long, y double")


def _config_fn(trial):
    lags = trial.suggest_categorical("lags", [[1], [1, 7]])
    return {
        "model_params": {},
        "mlf_init_params": {"lags": lags, "date_features": None},
        "mlf_fit_params": {},
    }


def test_objective_evaluates_and_records_config(spark, opt_panel):
    objective = mlforecast_objective(
        opt_panel,
        _config_fn,
        smape_loss,
        LinearRegression(),
        freq=1,
        n_windows=2,
        h=3,
    )
    rng = random.Random(0)
    losses = []
    for i in range(3):
        trial = RandomTrial(rng, number=i)
        val = objective(trial)
        assert np.isfinite(val) and val >= 0
        assert trial.user_attrs["config"]["mlf_init_params"]["lags"] in ([1], [1, 7])
        losses.append((val, trial.user_attrs["config"]))
    assert min(l for l, _ in losses) < 1.0  # trending series: smape is small


def test_objective_inf_on_featureless_config(spark, opt_panel):
    def empty_config(trial):
        return {
            "model_params": {},
            "mlf_init_params": {
                "lags": None, "lag_transforms": None, "date_features": None
            },
            "mlf_fit_params": {},
        }

    objective = mlforecast_objective(
        opt_panel, empty_config, smape_loss, LinearRegression(), 1, 2, 3
    )
    trial = RandomTrial(random.Random(1))
    assert objective(trial) == float("inf")
    assert "config" in trial.user_attrs  # recorded even for pruned configs


def test_objective_applies_model_params(spark, opt_panel):
    def cfg(trial):
        return {
            "model_params": {"alpha": trial.suggest_float("alpha", 0.1, 1.0)},
            "mlf_init_params": {"lags": [1]},
            "mlf_fit_params": {},
        }

    objective = mlforecast_objective(
        opt_panel, cfg, smape_loss, Ridge(), 1, 2, 3
    )
    trial = RandomTrial(random.Random(2))
    val = objective(trial)
    assert np.isfinite(val)
    assert 0.1 <= trial.params["alpha"] <= 1.0


def test_objective_with_precomputed_cv_splits(spark, opt_panel):
    """cv_splits branch (reference optimization.py:120-190): precomputed
    (cutoffs, train, valid) tuples reused across trials, refit cadence
    respected (i==0 fits; later splits warm up via new_df), per-split
    trial.report observed."""
    from pyspark.sql import functions as F

    cut1, cut2 = 33, 36
    splits = []
    for cut in (cut1, cut2):
        train = opt_panel.filter(F.col("ds") <= cut)
        valid = opt_panel.filter((F.col("ds") > cut) & (F.col("ds") <= cut + 3))
        cutoffs = train.groupBy("unique_id").agg(F.max("ds").alias("cutoff"))
        splits.append((cutoffs, train, valid))

    objective = mlforecast_objective(
        opt_panel,
        _config_fn,
        smape_loss,
        LinearRegression(),
        freq=1,
        n_windows=2,
        h=3,
        refit=False,
        cv_splits=splits,
    )

    class ReportingTrial(RandomTrial):
        def __init__(self, rng, number=0):
            super().__init__(rng, number=number)
            self.reports = []

        def report(self, value, step):
            self.reports.append((step, value))

        def should_prune(self):
            return False

    rng = random.Random(1)
    trial = ReportingTrial(rng)
    val = objective(trial)
    assert np.isfinite(val) and val >= 0
    assert [s for s, _ in trial.reports] == [0, 1]
    # the returned value is the mean of the per-split metrics
    assert abs(val - np.mean([v for _, v in trial.reports])) < 1e-12
