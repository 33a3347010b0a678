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
