"""Hyperparameter-search objective for MLForecast, optuna-compatible.

Reference surface: ``mlforecast_objective``
(`/root/reference/mlforecast/optimization.py:46-190`) returns a callable
``objective(trial) -> float`` for optuna studies. optuna is not in this
container, but the objective only needs the Trial duck-type (``suggest_*``
+ ``set_user_attr``), so this module ships :class:`RandomTrial`, a seeded
shim with that surface — the same objective runs under a plain random
search here and plugs into ``optuna.create_study`` unchanged when optuna
is installed.

Deviations from the reference, by design: ``loss`` takes the Spark CV
DataFrame and the model column name (``loss(cv_df, "model")`` — the
convention of :func:`mlforecast_spark.auto.smape_loss`) instead of two
pandas frames, and model hyperparameters are applied via sklearn-style
``set_params`` when present, else by re-constructing ``type(model)``.
"""

from __future__ import annotations

import copy
import random
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame

from .forecast import MLForecast
from .utils import Freq

__all__ = ["RandomTrial", "mlforecast_objective"]


class RandomTrial:
    """Seeded duck-type of ``optuna.Trial`` for library-free random search:
    ``suggest_int`` / ``suggest_float`` / ``suggest_categorical`` draw from
    the trial's rng; ``set_user_attr`` records onto ``user_attrs``."""

    def __init__(self, rng: random.Random, number: int = 0):
        self.rng = rng
        self.number = number
        self.user_attrs: dict = {}
        self.params: dict = {}

    def suggest_int(self, name: str, low: int, high: int, step: int = 1) -> int:
        val = self.rng.randrange(low, high + 1, step)
        self.params[name] = val
        return val

    def suggest_float(
        self, name: str, low: float, high: float, log: bool = False
    ) -> float:
        import math

        if log:
            val = math.exp(self.rng.uniform(math.log(low), math.log(high)))
        else:
            val = self.rng.uniform(low, high)
        self.params[name] = val
        return val

    def suggest_categorical(self, name: str, choices: Sequence):
        val = self.rng.choice(list(choices))
        self.params[name] = val
        return val

    def set_user_attr(self, key: str, value) -> None:
        self.user_attrs[key] = value


def _apply_model_params(model, params: dict):
    model = copy.deepcopy(model)
    if not params:
        return model
    if hasattr(model, "set_params"):
        model.set_params(**params)
        return model
    try:
        base = {
            k: getattr(model, k)
            for k in getattr(model, "__dict__", {})
            if not k.endswith("_") and not k.startswith("_")
        }
        return type(model)(**{**base, **params})
    except TypeError:
        for k, v in params.items():
            setattr(model, k, v)
        return model


def mlforecast_objective(
    df: DataFrame,
    config_fn: Callable,
    loss: Callable[[DataFrame, str], float],
    model,
    freq: Freq,
    n_windows: int,
    h: int,
    step_size: Optional[int] = None,
    refit: Union[bool, int] = False,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    weight_col: Optional[str] = None,
) -> Callable:
    """Build ``objective(trial) -> float`` evaluating one hyperparameter
    configuration by cross-validation, mirroring the reference's optuna
    objective (`optimization.py:46-190`): ``config_fn(trial)`` must return
    ``{"model_params", "mlf_init_params", "mlf_fit_params"}``; a
    configuration with no features at all (lags, lag_transforms and
    date_features all None) scores ``inf`` without training, and the full
    config is recorded on the trial as user attr ``"config"``."""

    def objective(trial) -> float:
        config = copy.deepcopy(config_fn(trial))
        trial.set_user_attr("config", copy.deepcopy(config))
        init = config.get("mlf_init_params", {})
        if all(
            init.get(k) is None for k in ("lags", "lag_transforms", "date_features")
        ):
            return float("inf")
        mdl = _apply_model_params(model, config.get("model_params", {}))
        mlf = MLForecast(models={"model": mdl}, freq=freq, **init)
        fit_params = dict(config.get("mlf_fit_params", {}))
        cv = mlf.cross_validation(
            df,
            n_windows=n_windows,
            h=h,
            id_col=id_col,
            time_col=time_col,
            target_col=target_col,
            step_size=step_size,
            refit=refit,
            weight_col=weight_col,
            **fit_params,
        ).cache()
        try:
            return float(loss(cv, "model"))
        finally:
            cv.unpersist()

    return objective
