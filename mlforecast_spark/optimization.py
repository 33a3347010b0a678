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
    input_size: Optional[int] = None,
    refit: Union[bool, int] = False,
    id_col: str = "unique_id",
    time_col: str = "ds",
    target_col: str = "y",
    weight_col: Optional[str] = None,
    cv_splits: Optional[list] = None,
) -> Callable:
    """Build ``objective(trial) -> float`` evaluating one hyperparameter
    configuration by cross-validation, mirroring the reference's optuna
    objective (`optimization.py:46-190`): ``config_fn(trial)`` must return
    ``{"model_params", "mlf_init_params", "mlf_fit_params"}``; a
    configuration with no features at all (lags, lag_transforms and
    date_features all None) scores ``inf`` without training, and the full
    config is recorded on the trial as user attr ``"config"``.

    ``cv_splits``: optional precomputed ``(cutoffs, train, valid)`` frame
    tuples reused across trials (the reference caches splits the same
    way); each split is evaluated fit-or-warm-up per the ``refit``
    cadence, with per-split ``trial.report`` + pruning when the trial
    object supports it. ``input_size`` trims each window's training
    history (passes through to ``cross_validation`` when splits are
    derived internally)."""

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
        if cv_splits is None:
            cv = mlf.cross_validation(
                df,
                n_windows=n_windows,
                h=h,
                id_col=id_col,
                time_col=time_col,
                target_col=target_col,
                step_size=step_size,
                input_size=input_size,
                refit=refit,
                weight_col=weight_col,
                **fit_params,
            ).cache()
            try:
                return float(loss(cv, "model"))
            finally:
                cv.unpersist()

        import numpy as np
        from pyspark.sql import functions as F

        metrics = []
        for i, (_, train, valid) in enumerate(list(cv_splits)):
            should_fit = i == 0 or (refit > 0 and i % refit == 0)
            if should_fit:
                mlf.fit(
                    train,
                    id_col=id_col,
                    time_col=time_col,
                    target_col=target_col,
                    weight_col=weight_col,
                    **fit_params,
                )
            # dynamic exog in the valid frame ride through X_df, like the
            # reference's dynamic-column detection
            static_cols = list(getattr(mlf, "static_cols_", []) or [])
            base_cols = {id_col, time_col, target_col}
            if weight_col is not None:
                base_cols.add(weight_col)
            dynamic = [
                c for c in valid.columns if c not in base_cols.union(static_cols)
            ]
            X_df = (
                valid.drop(target_col, *static_cols) if dynamic else None
            )
            new_df = None if should_fit else (
                train.drop(weight_col) if weight_col is not None else train
            )
            preds = mlf.predict(h=h, X_df=X_df, new_df=new_df)
            result = valid.select(id_col, time_col, target_col).join(
                preds, on=[id_col, time_col]
            )
            n_result = result.cache().count()
            if n_result < valid.count():
                result.unpersist()
                raise ValueError(
                    "Cross validation result produced less results than "
                    "expected. Please verify that the passed frequency (freq) "
                    "matches your series' and that there aren't any missing "
                    "periods."
                )
            try:
                metric = float(loss(result, "model"))
            finally:
                result.unpersist()
            metrics.append(metric)
            if hasattr(trial, "report"):
                trial.report(metric, step=i)
                if hasattr(trial, "should_prune") and trial.should_prune():
                    try:
                        import optuna

                        raise optuna.TrialPruned()
                    except ImportError:
                        break
        return float(np.mean(metrics))

    return objective
