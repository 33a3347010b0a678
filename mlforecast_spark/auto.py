"""Hyperparameter / feature-config search over the CV loss.

Reference: `/root/reference/mlforecast/auto.py` (AutoModel `:127-145`,
AutoMLForecast `:251-691`, seasonality-derived candidate configs
`:308-447`) and the objective in `optimization.py:46-190`. The reference
drives optuna; optuna is not available in this container, so the same
objective runs under a seeded random search (optuna is used instead when
importable — identical study shape).
"""

from __future__ import annotations

import random
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .forecast import MLForecast
from .local_predict import CogroupUnsupportedError
from .lag_transforms import ExpandingMean, ExponentiallyWeightedMean, RollingMean
from .target_transforms import Differences, GlobalSklearnTransformer


class AutoModel:
    """A model plus a parameter-space sampler: ``config(rng) -> dict`` of
    constructor kwargs (`/root/reference/mlforecast/auto.py:127-145`)."""

    def __init__(self, model_cls, config: Optional[Callable] = None):
        self.model_cls = model_cls
        self.config = config or (lambda rng: {})

    def sample(self, rng: random.Random):
        return self.model_cls(**self.config(rng))


# ---------------------------------------------------------------------------
# reference parameter spaces (`/root/reference/mlforecast/auto.py:49-124`),
# re-expressed over a seeded random.Random instead of an optuna trial (the
# optimization shim drives either — see optimization.py)
# ---------------------------------------------------------------------------

def _log_uniform(rng: random.Random, lo: float, hi: float) -> float:
    import math

    return math.exp(rng.uniform(math.log(lo), math.log(hi)))


def linear_regression_space(rng: random.Random) -> dict:
    return {"fit_intercept": rng.choice([True, False])}


def ridge_space(rng: random.Random) -> dict:
    return {
        "fit_intercept": rng.choice([True, False]),
        "alpha": rng.uniform(0.001, 10.0),
    }


def lasso_space(rng: random.Random) -> dict:
    return {
        "fit_intercept": rng.choice([True, False]),
        "alpha": rng.uniform(0.001, 10.0),
    }


def elastic_net_space(rng: random.Random) -> dict:
    return {
        "fit_intercept": rng.choice([True, False]),
        "alpha": rng.uniform(0.001, 10.0),
        "l1_ratio": rng.uniform(0.0, 1.0),
    }


def random_forest_space(rng: random.Random) -> dict:
    return {
        "n_estimators": rng.randint(50, 1000),
        "max_depth": rng.randint(1, 10),
        "min_samples_split": rng.randint(2, 100),
        "max_features": rng.uniform(0.5, 1.0),
    }


def gbt_space(rng: random.Random) -> dict:
    """Space for the in-repo histogram GBT — the reference's lightgbm space
    translated to GradientBoostedTrees' surface."""
    return {
        "learning_rate": 0.05,
        "n_estimators": int(round(_log_uniform(rng, 20, 1000))),
        "reg_lambda": _log_uniform(rng, 1e-8, 10.0),
        "max_depth": rng.randint(3, 12),
        "min_child_samples": rng.randint(5, 100),
    }


def lightgbm_space(rng: random.Random) -> dict:
    return {
        "bagging_freq": 1,
        "learning_rate": 0.05,
        "verbosity": -1,
        "n_estimators": int(round(_log_uniform(rng, 20, 1000))),
        "lambda_l1": _log_uniform(rng, 1e-8, 10.0),
        "lambda_l2": _log_uniform(rng, 1e-8, 10.0),
        "num_leaves": int(round(_log_uniform(rng, 2, 4096))),
        "feature_fraction": rng.uniform(0.5, 1.0),
        "bagging_fraction": rng.uniform(0.5, 1.0),
        "objective": rng.choice(["l1", "l2"]),
    }


def xgboost_space(rng: random.Random) -> dict:
    return {
        "n_estimators": rng.randint(20, 1000),
        "max_depth": rng.randint(1, 10),
        "learning_rate": _log_uniform(rng, 1e-3, 0.2),
        "subsample": rng.uniform(0.1, 1.0),
        "colsample_bytree": rng.uniform(0.1, 1.0),
        "reg_lambda": _log_uniform(rng, 1e-8, 1.0),
        "reg_alpha": _log_uniform(rng, 1e-8, 1.0),
        "min_child_weight": rng.randint(2, 10),
    }


def catboost_space(rng: random.Random) -> dict:
    return {
        "silent": True,
        "n_estimators": rng.randint(50, 1000),
        "depth": rng.randint(1, 10),
        "learning_rate": _log_uniform(rng, 1e-3, 0.2),
        "subsample": rng.uniform(0.1, 1.0),
        "colsample_bylevel": rng.uniform(0.1, 1.0),
        "min_data_in_leaf": rng.uniform(1, 100),
    }


class AutoLinearRegression(AutoModel):
    def __init__(self, config: Optional[Callable] = None):
        from .models import LinearRegression

        super().__init__(LinearRegression, config or linear_regression_space)


class AutoRidge(AutoModel):
    def __init__(self, config: Optional[Callable] = None):
        from .models import Ridge

        super().__init__(Ridge, config or ridge_space)


class AutoLasso(AutoModel):
    def __init__(self, config: Optional[Callable] = None):
        from .models import Lasso

        super().__init__(Lasso, config or lasso_space)


class AutoElasticNet(AutoModel):
    def __init__(self, config: Optional[Callable] = None):
        from .models import ElasticNet

        super().__init__(ElasticNet, config or elastic_net_space)


class AutoRandomForest(AutoModel):
    def __init__(self, config: Optional[Callable] = None):
        from .models_gbt import RandomForest

        super().__init__(RandomForest, config or random_forest_space)


class AutoGBT(AutoModel):
    """The in-container boosted-tree preset (no external libs needed)."""

    def __init__(self, config: Optional[Callable] = None):
        from .models_gbt import GradientBoostedTrees

        super().__init__(GradientBoostedTrees, config or gbt_space)


class AutoLightGBM(AutoModel):
    """LightGBM-over-Spark preset — needs synapseml + lightgbm at fit time
    (`models_external.SparkLGBMForecast`); use :class:`AutoGBT` where the
    libraries are unavailable."""

    def __init__(self, config: Optional[Callable] = None):
        from .models_external import SparkLGBMForecast

        super().__init__(SparkLGBMForecast, config or lightgbm_space)


class AutoXGBoost(AutoModel):
    """XGBoost-over-Spark preset — needs xgboost>=1.7 at fit time
    (`models_external.SparkXGBForecast`)."""

    def __init__(self, config: Optional[Callable] = None):
        from .models_external import SparkXGBForecast

        super().__init__(SparkXGBForecast, config or xgboost_space)


class AutoCatboost(AutoModel):
    """CatBoost preset — raises ImportError unless catboost is installed
    (the reference constructs ``CatBoostRegressor`` the same way)."""

    def __init__(self, config: Optional[Callable] = None):
        import importlib

        mod = importlib.import_module("catboost")
        super().__init__(mod.CatBoostRegressor, config or catboost_space)


def smape_loss(cv_df, model_name: str, target_col: str = "y") -> float:
    """Symmetric MAPE over a collected CV frame (the reference's default
    metric family, `tests/test_m4.py`)."""
    row = (
        cv_df.select(
            F.avg(
                F.when(
                    (F.abs(F.col(target_col)) + F.abs(F.col(model_name))) > 0,
                    2.0
                    * F.abs(F.col(model_name) - F.col(target_col))
                    / (F.abs(F.col(target_col)) + F.abs(F.col(model_name))),
                ).otherwise(0.0)
            ).alias("smape")
        )
    ).collect()[0]
    return float(row["smape"]) if row["smape"] is not None else float("inf")


def _seasonality_based_space(
    season_length: Optional[int],
    h: int,
    min_samples: int,
    min_value: float,
    int_freq: bool,
):
    """The reference's full seasonality-derived candidate space
    (`/root/reference/mlforecast/auto.py:308-447`): target transforms gated
    on sign and history length, per-seasonality lag menus, EWM(0.9) +
    season-window rolling-mean lag transforms, seasonality-mapped date
    features."""
    from .target_transforms import LocalStandardScaler

    sl = season_length or 1
    log1p = GlobalSklearnTransformer("log1p")
    targ_choices: list = [
        None,
        [LocalStandardScaler()],
        [Differences([1]), LocalStandardScaler()],
    ]
    if min_value >= 0:
        targ_choices.extend(
            [
                [log1p, LocalStandardScaler()],
                [log1p, Differences([1]), LocalStandardScaler()],
            ]
        )
    # leave two seasonal periods for the features and model
    if sl > 1 and min_samples > 3 * sl + 1:
        targ_choices.append([Differences([1, sl]), LocalStandardScaler()])
        if min_value >= 0:
            targ_choices.append(
                [log1p, Differences([1, sl]), LocalStandardScaler()]
            )

    lag_choices: list = [None, [sl]]
    extra_lags = {
        7: [[7, 14], [7, 28]],
        12: [list(range(1, 13))],
        24: [list(range(1, 25)), list(range(24, 24 * 7 + 1, 24))],
        52: [list(range(4, 53, 4))],
    }
    if sl in extra_lags:
        lag_choices.extend(extra_lags[sl])
    if h >= 2 * sl:
        lag_choices.extend(
            [list(range(sl, h + 1, sl)), [h], [sl, h]]
        )

    tfm_choices: list = [None, {1: [ExponentiallyWeightedMean(alpha=0.9)]}]
    if sl > 1:
        tfm_choices.append(
            {
                1: [ExponentiallyWeightedMean(alpha=0.9)],
                sl: [RollingMean(window_size=sl, min_samples=1)],
            }
        )
    if sl != h:
        tfm_choices.append(
            {
                1: [ExponentiallyWeightedMean(alpha=0.9)],
                sl: [RollingMean(window_size=sl, min_samples=1)],
                h: [RollingMean(window_size=sl, min_samples=1)],
            }
        )

    date_map = {
        1: ["year"],
        4: ["quarter", "year"],
        7: ["dayofweek", "month", "year"],
        12: ["month", "year"],
        24: ["hour", "dayofweek", "month", "year"],
        52: ["week", "year"],
        60: ["dayofweek", "hour", "second"],
    }
    date_features = [] if int_freq else date_map.get(sl, [])
    date_choices = [[], date_features] if date_features else [[]]
    return lag_choices, tfm_choices, date_choices, targ_choices


class AutoMLForecast:
    """Search feature configs + model params by backtest loss, then fit the
    winner on the full panel."""

    def __init__(
        self,
        models,
        freq,
        season_length: Optional[int] = None,
        init_config: Optional[Callable] = None,
        num_samples: int = 8,
        loss: Optional[Callable] = None,
        seed: int = 0,
    ):
        if isinstance(models, dict):
            self.models = models
        else:
            self.models = {m.model_cls.__name__: m for m in models}
        self.freq = freq
        self.season_length = season_length
        self.init_config = init_config
        self.num_samples = num_samples
        self.loss = loss or smape_loss
        self.seed = seed

    def _sample_feature_config(self, rng: random.Random, space=None) -> dict:
        if self.init_config is not None:
            return self.init_config(rng)
        lags, tfms, dates, targets = space
        return {
            "lags": rng.choice(lags),
            "lag_transforms": rng.choice(tfms),
            "date_features": rng.choice(dates),
            "target_transforms": rng.choice(targets),
        }

    def fit(
        self,
        df: DataFrame,
        n_windows: int = 2,
        h: int = 7,
        id_col: str = "unique_id",
        time_col: str = "ds",
        target_col: str = "y",
        static_features: Optional[Sequence[str]] = None,
        engine: str = "spark",
    ) -> "AutoMLForecast":
        # ``engine='cogroup'`` routes every trial's backtest through the
        # single-job rollout (local_predict.py); configs whose sampled
        # features the cogroup engine refuses (pooled transforms) fall back
        # to the lockstep loop for that trial instead of failing the study.
        rng = random.Random(self.seed)
        space = None
        if self.init_config is None:
            # panel stats gate the candidate space (reference auto.py:308-346)
            stats = (
                df.groupBy(id_col)
                .agg(
                    F.count(target_col).alias("_n"),
                    F.min(target_col).alias("_mn"),
                )
                .agg(F.min("_n").alias("_n"), F.min("_mn").alias("_mn"))
                .collect()[0]
            )
            space = _seasonality_based_space(
                self.season_length,
                h,
                int(stats["_n"] or 0),
                float(stats["_mn"] if stats["_mn"] is not None else -1.0),
                isinstance(self.freq, int),
            )
        self.trials_ = []
        best = {name: (float("inf"), None, None) for name in self.models}
        for trial in range(self.num_samples):
            feat_cfg = self._sample_feature_config(rng, space)
            model_insts = {
                name: am.sample(rng) for name, am in self.models.items()
            }
            mf = MLForecast(
                models=model_insts,
                freq=self.freq,
                lags=feat_cfg.get("lags"),
                lag_transforms=feat_cfg.get("lag_transforms"),
                date_features=feat_cfg.get("date_features"),
                target_transforms=feat_cfg.get("target_transforms"),
            )
            try:
                try:
                    cv = mf.cross_validation(
                        df,
                        n_windows=n_windows,
                        h=h,
                        id_col=id_col,
                        time_col=time_col,
                        target_col=target_col,
                        static_features=static_features,
                        engine=engine,
                    ).cache()
                except CogroupUnsupportedError:
                    if engine == "spark":
                        raise
                    cv = mf.cross_validation(
                        df,
                        n_windows=n_windows,
                        h=h,
                        id_col=id_col,
                        time_col=time_col,
                        target_col=target_col,
                        static_features=static_features,
                        engine="spark",
                    ).cache()
                losses = {
                    name: self.loss(cv, name, target_col) for name in self.models
                }
                cv.unpersist()
            except Exception as e:  # a bad config shouldn't kill the study
                self.trials_.append({"trial": trial, "config": feat_cfg, "error": str(e)})
                continue
            self.trials_.append(
                {"trial": trial, "config": feat_cfg, "losses": losses}
            )
            for name, lv in losses.items():
                if lv < best[name][0]:
                    best[name] = (lv, feat_cfg, model_insts[name])
        self.best_ = best
        # final fit per model on its winning config
        self.results_ = {}
        for name, (lv, cfg, model) in best.items():
            if cfg is None:
                raise RuntimeError(f"every trial failed for model {name}")
            mf = MLForecast(
                models={name: model},
                freq=self.freq,
                lags=cfg.get("lags"),
                lag_transforms=cfg.get("lag_transforms"),
                date_features=cfg.get("date_features"),
                target_transforms=cfg.get("target_transforms"),
            )
            mf.fit(
                df,
                id_col=id_col,
                time_col=time_col,
                target_col=target_col,
                static_features=static_features,
            )
            self.results_[name] = mf
        return self

    def predict(self, h: int, **kwargs) -> DataFrame:
        out = None
        for name, mf in self.results_.items():
            preds = mf.predict(h, **kwargs)
            if out is None:
                out = preds
            else:
                s = mf.schema_
                out = out.join(preds, on=[s.id_col, s.time_col], how="inner")
        return out
