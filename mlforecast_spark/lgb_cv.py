"""Staged-boosting cross-validation with early stopping.

Reference: ``LightGBMCV`` (`/root/reference/mlforecast/lgb_cv.py:111-560`):
train one booster per CV window *incrementally* (``num_iterations`` trees at
a time), evaluate the metric on each window's validation span after every
stage, stop early when the averaged metric stops improving, and optionally
build a final ``MLForecast`` with the discovered best iteration count
(``MLForecast.from_cv``, `/root/reference/mlforecast/forecast.py:223-236`).

LightGBM is not available here; the engine's own histogram GBT
(`models_gbt.GradientBoostedTrees`) plays the booster role — it supports
incremental tree addition, which is all partial_fit needs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .forecast import MLForecast
from .local_predict import CogroupUnsupportedError
from .models_gbt import GradientBoostedTrees
from .utils import time_plus


class LightGBMCV:
    """CV-driven staged boosting (API-parity name; the booster is the
    engine's native histogram GBT)."""

    def __init__(
        self,
        freq,
        lags: Optional[Sequence[int]] = None,
        lag_transforms: Optional[dict] = None,
        date_features: Optional[Sequence] = None,
        target_transforms: Optional[Sequence] = None,
        num_threads: int = 1,
        params: Optional[dict] = None,
        predict_engine: str = "spark",
    ):
        # predict_engine='cogroup' scores each eval stage with the
        # single-job rollout (local_predict.py) instead of h sequential
        # frontier jobs — per partial_fit call, per window; feature sets the
        # cogroup engine refuses fall back to the loop permanently.
        self.predict_engine = predict_engine
        self.freq = freq
        self.lags = lags
        self.lag_transforms = lag_transforms
        self.date_features = date_features
        self.target_transforms = target_transforms
        self.params = params or {}

    def setup(
        self,
        df: DataFrame,
        n_windows: int,
        h: int,
        id_col: str = "unique_id",
        time_col: str = "ds",
        target_col: str = "y",
        static_features: Optional[Sequence[str]] = None,
    ):
        """Materialize each window's train matrix + validation targets."""
        self._cols = (id_col, time_col, target_col)
        self.h = h
        mf = MLForecast(
            models=[],
            freq=self.freq,
            lags=self.lags,
            lag_transforms=self.lag_transforms,
            date_features=self.date_features,
            target_transforms=self.target_transforms,
        )
        self._template = mf
        w_last = Window.partitionBy(id_col)
        df = df.withColumn("_max_ds", F.max(time_col).over(w_last))
        self._windows = []
        for i in range(n_windows):
            back = h * (n_windows - i)
            cutoff = time_plus(F.col("_max_ds"), self.freq, -back)
            train = df.filter(F.col(time_col) <= cutoff).drop("_max_ds")
            valid = df.filter(
                (F.col(time_col) > cutoff)
                & (F.col(time_col) <= time_plus(cutoff, self.freq, h))
            ).drop("_max_ds")
            import copy

            mf_w = copy.deepcopy(self._template)
            feats = mf_w.preprocess(
                train,
                id_col=id_col,
                time_col=time_col,
                target_col=target_col,
                static_features=static_features,
            )
            mf_w._capture_state(train, id_col, time_col, target_col)
            booster = GradientBoostedTrees(n_estimators=0, **self.params)
            wstate = {
                "mf": mf_w,
                "booster": booster,
                # validation stays a Spark frame — the metric is computed
                # distributed, never collected
                "valid": valid.select(id_col, time_col, target_col),
            }
            n_feats = len(mf_w.features_order_)
            sel = [
                F.col(f"`{c}`").cast("double").alias(f"_f{i}")
                for i, c in enumerate(mf_w.features_order_)
            ] + [F.col(f"`{target_col}`").cast("double").alias("_t")]
            data = feats.select(*sel).na.drop()
            n_rows = data.count()
            if n_rows <= booster.collect_threshold:
                # small windows: driver-local staged boosting is cheaper
                pdf = data.toPandas()
                X = pdf[[f"_f{i}" for i in range(n_feats)]].to_numpy(dtype="float64")
                y = pdf["_t"].to_numpy(dtype="float64")
                booster._fit_bins(X)
                booster.base_score_ = float(np.nanmean(y))
                wstate.update(X=X, y=y)
            else:
                # scale path: binned rows + carried prediction live as a
                # checkpointed Spark frame; each stage grows trees via the
                # distributed histogram passes (no full-matrix collect)
                wstate["binned"] = booster.prepare_spark_state(data, n_feats, n_rows)
                wstate["n_feats"] = n_feats
            self._windows.append(wstate)
        self.metric_history_: list[float] = []
        return self

    def partial_fit(self, num_iterations: int = 10) -> float:
        """Add ``num_iterations`` trees to every window's booster, return the
        averaged validation metric at the new stage."""
        id_col, time_col, target_col = self._cols
        scores = []
        for wstate in self._windows:
            booster = wstate["booster"]
            if "binned" in wstate:
                wstate["binned"] = booster.boost_spark(
                    wstate["binned"], wstate["n_feats"], num_iterations
                )
            else:
                X, y = wstate["X"], wstate["y"]
                Xb = booster._bin(X)
                pred = booster.predict(X) if booster.trees_ else np.full(len(y), booster.base_score_)
                for _ in range(num_iterations):
                    resid = y - pred
                    tree = booster._grow_tree_local(Xb, resid)
                    booster.trees_.append(tree)
                    pred = pred + booster.learning_rate * booster._apply_tree(tree, Xb)
            # score via the recursive engine with the current booster;
            # SMAPE aggregates in Spark — validation rows never hit the driver
            mf = wstate["mf"]
            mf.models_ = {"Booster": booster}
            mf.max_horizon_ = None
            try:
                preds = mf.predict(self.h, engine=self.predict_engine)
            except CogroupUnsupportedError:
                if self.predict_engine == "spark":
                    raise
                self.predict_engine = "spark"
                preds = mf.predict(self.h)
            merged = wstate["valid"].join(preds, on=[id_col, time_col])
            y_c, p_c = F.col(f"`{target_col}`"), F.col("Booster")
            denom = F.abs(y_c) + F.abs(p_c)
            row = merged.select(
                F.avg(
                    F.when(denom > 0, 2.0 * F.abs(p_c - y_c) / denom)
                ).alias("s")
            ).collect()[0]
            scores.append(float(row["s"] if row["s"] is not None else 0.0))
        score = float(np.mean(scores))
        self.metric_history_.append(score)
        return score

    def fit(
        self,
        df: DataFrame,
        n_windows: int,
        h: int,
        num_iterations: int = 100,
        early_stopping_evals: int = 2,
        eval_every: int = 10,
        **setup_kwargs,
    ):
        """Full loop: stage trees until the metric stops improving."""
        self.setup(df, n_windows, h, **setup_kwargs)
        best = float("inf")
        since_best = 0
        rounds = 0
        while rounds < num_iterations:
            step = min(eval_every, num_iterations - rounds)
            score = self.partial_fit(step)
            rounds += step
            if score < best - 1e-12:
                best, since_best = score, 0
            else:
                since_best += 1
                if since_best >= early_stopping_evals:
                    break
        self.best_iteration_ = (
            (int(np.argmin(self.metric_history_)) + 1) * eval_every
        )
        self.best_score_ = best
        return self.metric_history_

    def to_mlforecast(self) -> MLForecast:
        """MLForecast configured with the discovered iteration count
        (the reference's ``MLForecast.from_cv``)."""
        params = dict(self.params)
        params["n_estimators"] = self.best_iteration_
        return MLForecast(
            models=[GradientBoostedTrees(**params)],
            freq=self.freq,
            lags=self.lags,
            lag_transforms=self.lag_transforms,
            date_features=self.date_features,
            target_transforms=self.target_transforms,
        )
